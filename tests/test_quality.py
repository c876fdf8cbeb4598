"""quality.py — repetition signals, decontamination, n-gram stats, PII."""

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.functions import quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_repetition_profile_hand_checked(spark):
    df = _docs(spark, [
        ("a", "x x x x"),                 # one word repeated 4x
        ("b", "one two three four"),      # all unique
        ("c", ""),                        # empty
        ("d", "p q p q p q"),             # repeated 2-gram
    ])
    got = {r["doc_id"]: r for r in
           quality.repetition_profile(df).collect()}
    a = got["a"]
    assert a["n_tokens"] == 4
    assert a["dup_word_frac"] == pytest.approx(0.75)
    assert a["top_word_frac"] == pytest.approx(1.0)
    # 3 2-grams, all "x x" -> 1 distinct -> dup frac 2/3
    assert a["dup_2gram_frac"] == pytest.approx(round(1 - 1 / 3, 6))
    b = got["b"]
    assert b["dup_word_frac"] == 0.0
    assert b["dup_2gram_frac"] == 0.0
    assert b["top_word_frac"] == pytest.approx(0.25)
    c = got["c"]
    assert (c["n_tokens"], c["dup_word_frac"], c["top_word_frac"]) == \
        (0, 0.0, 0.0)
    d = got["d"]
    # 5 2-grams: "p q" x3, "q p" x2 -> 2 distinct -> 3/5
    assert d["dup_2gram_frac"] == pytest.approx(0.6)


def test_contamination_and_decontaminate(spark):
    train = _docs(spark, [
        ("t1", "alpha beta gamma delta epsilon"),   # shares the eval 4-gram
        ("t2", "unrelated words only here now"),
        ("t3", "alpha beta gamma delta zeta"),      # same shared 4-gram
    ])
    ev = _docs(spark, [("e1", "alpha beta gamma delta")])
    hits = {r["doc_id"]: r["n_shared"]
            for r in quality.contamination(train, ev, k=4).collect()}
    assert hits == {"t1": 1, "t3": 1}
    clean = {r["doc_id"]
             for r in quality.decontaminate(train, ev, k=4).collect()}
    assert clean == {"t2"}


def test_top_ngrams_ordering(spark):
    df = _docs(spark, [
        ("a", "red blue red blue red"),
        ("b", "red blue green"),
    ])
    rows = quality.top_ngrams(df, k=2, top_n=3).collect()
    # "red blue": 2x in a + 1x in b = tf 3, docs 2 — must rank first
    assert rows[0]["shingle"] == "red blue"
    assert rows[0]["tf"] == 3 and rows[0]["n_docs"] == 2
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)


def test_pii_profile_and_redact(spark):
    df = spark.createDataFrame([
        ("1", "mail bob@example.com or +1 (555) 123-4567 from 10.0.0.1"),
        ("2", "nothing sensitive here"),
    ], "doc_id string, text string")
    prof = {r["doc_id"]: r for r in quality.pii_profile(df).collect()}
    assert (prof["1"]["n_email"], prof["1"]["n_ipv4"],
            prof["1"]["n_phone"]) == (1, 1, 1)
    assert (prof["2"]["n_email"], prof["2"]["n_ipv4"],
            prof["2"]["n_phone"]) == (0, 0, 0)
    red = {r["doc_id"]: r["text"]
           for r in quality.pii_redact(df).collect()}
    assert "[EMAIL]" in red["1"] and "[IPV4]" in red["1"] \
        and "[PHONE]" in red["1"]
    assert "bob@example.com" not in red["1"]
    assert "555" not in red["1"] and "10.0.0.1" not in red["1"]
    assert red["2"] == "nothing sensitive here"
    # redacted text scans clean
    rescanned = {r["doc_id"]: r["n_email"] + r["n_ipv4"] + r["n_phone"]
                 for r in quality.pii_profile(
                     quality.pii_redact(df)).collect()}
    assert rescanned == {"1": 0, "2": 0}


def test_repetition_profile_plan_is_narrow(spark):
    """The per-doc signals must be a single projection over the scan —
    no Exchange, no Python eval."""
    df = _docs(spark, [("a", "x y z")])
    plan = quality.repetition_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_line_dedup_removes_cross_doc_lines(spark):
    df = spark.createDataFrame([
        ("a", "copyright footer\nunique alpha\nnav bar"),
        ("b", "copyright footer\nunique beta\nnav bar"),
        ("c", "unique gamma\nCOPYRIGHT FOOTER  "),  # normalized match
        ("d", ""),
    ], "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           quality.line_dedup(df, min_docs=2).collect()}
    # "copyright footer" in 3 docs (case/space-insensitively), "nav bar"
    # in 2 -> both stripped; uniques survive in original order
    assert got["a"]["text"] == "unique alpha"
    assert got["b"]["text"] == "unique beta"
    assert got["c"]["text"] == "unique gamma"
    assert got["a"]["n_lines"] == 3 and got["a"]["n_removed"] == 2
    assert got["c"]["n_removed"] == 1
    assert got["d"]["text"] == "" and got["d"]["n_removed"] == 0


def test_line_dedup_min_chars_protects_short_lines(spark):
    df = spark.createDataFrame([
        ("a", "ok\nlong shared line"),
        ("b", "ok\nlong shared line"),
    ], "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           quality.line_dedup(df, min_docs=2, min_chars=5).collect()}
    # "ok" (< 5 chars) is exempt even though duplicated
    assert got["a"]["text"] == "ok"
    assert got["a"]["n_removed"] == 1


def test_line_dedup_order_preserved_and_frac_threshold(spark):
    rows = [(str(i), f"boiler plate\nkeep {i} first\nkeep {i} second")
            for i in range(10)] + [("x", "solo doc line")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in
           quality.line_dedup(df, min_doc_frac=0.5).collect()}
    assert got["3"]["text"] == "keep 3 first\nkeep 3 second"
    assert got["x"]["text"] == "solo doc line"


def test_bloom_decontaminate_equals_exact(spark):
    docs = spark.createDataFrame(
        [(str(i), f"alpha beta gamma delta doc{i} tail word here")
         for i in range(40)] +
        [("e0", "alpha beta gamma delta eval leak one two"),
         ("e1", "totally different benchmark prompt text here now")],
        "doc_id string, text string")
    is_eval = F.col("doc_id").startswith("e")
    train, ev = docs.filter(~is_eval), docs.filter(is_eval)
    exact = sorted(r["doc_id"] for r in
                   quality.decontaminate(train, ev).select("doc_id")
                   .collect())
    bloom = sorted(r["doc_id"] for r in
                   quality.bloom_decontaminate(train, ev)
                   .select("doc_id").collect())
    assert bloom == exact
    # with a deliberately tiny filter (high FP rate) the exact verify
    # still makes the output identical
    tiny = sorted(r["doc_id"] for r in
                  quality.bloom_decontaminate(train, ev, num_bits=64,
                                              num_hashes=2)
                  .select("doc_id").collect())
    assert tiny == exact


def test_classifier_learns_language_markers(spark):
    from qvarn_mr_spark.functions import classifier as clf
    en = ["the cat and the dog is in the house",
          "the quick fox is of the essence and that is that",
          "a man of the people is not a myth",
          "it was the best of times it was the worst of times"]
    de = ["der hund und die katze ist nicht ein tier",
          "das ist der anfang und das ende der geschichte",
          "die frau und der mann sind nicht zu hause",
          "ein tag und eine nacht in der stadt"]
    rows = ([(i, t, 1) for i, t in enumerate(en)] +
            [(100 + i, t, 0) for i, t in enumerate(de)])
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w = clf.train_logreg(df, F.col("y") == 1, iters=60, lr=1.0)
    acc = clf.train_accuracy(df, F.col("y") == 1, w)
    assert acc == 1.0
    # the en-marker rate must push toward the positive class
    assert w["hits_en"] > 0
    # and filter keeps exactly the english docs
    kept = sorted(r["doc_id"] for r in
                  clf.classifier_filter(df, w).collect())
    assert kept == [0, 1, 2, 3]


def test_classifier_score_expr_matches_driver_sigmoid(spark):
    from qvarn_mr_spark.functions import classifier as clf
    df = spark.createDataFrame(
        [(0, "the cat and the dog")], "doc_id long, text string")
    feats = clf.feature_exprs()
    names = sorted(feats)
    vals = df.select(*[feats[n].alias(n) for n in names]).collect()[0]
    w = {n: 0.1 * (i + 1) for i, n in enumerate(names)}
    w["_bias"] = -0.4
    got = df.select(clf.score_expr(w).alias("s")).collect()[0]["s"]
    z = w["_bias"] + sum(w[n] * vals[n] for n in names)
    assert got == pytest.approx(clf.sigmoid(z), abs=1e-12)


def test_classifier_weights_are_raw_space(spark):
    """Standardization must be internal: returned weights score RAW
    features (no stats needed at serve time)."""
    from qvarn_mr_spark.functions import classifier as clf
    rows = [(i, ("long text " * (i + 1)).strip(), int(i >= 5))
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w = clf.train_logreg(df, F.col("y") == 1, iters=80, lr=1.0)
    assert clf.train_accuracy(df, F.col("y") == 1, w) >= 0.9


def test_bigram_surprisal_hand_values(spark):
    from qvarn_mr_spark.functions.text import bigram_surprisal
    import math
    # corpus: d0 = "a b a b" (transitions ab, ba, ab), d1 = "a b",
    # d2 = "z" (single token -> absent from output)
    rows = [(0, "a b a b"), (1, "a b"), (2, "z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_bigrams"] == 3 and got[1]["n_bigrams"] == 1
    # LM: c(a,b)=4? no: pairs = d0:(ab, ba, ab) + d1:(ab) -> c_ab=3,
    # c_ba=1; contexts c_a=3, c_b=1; unigrams a=3, b=3, z=1, N=7, V=3
    lam, s = 0.7, 0.5
    n, v = 7, 3

    def p(c_uw, c_u, c_w):
        return lam * c_uw / c_u + (1 - lam) * (c_w + s) / (n + s * v)

    nll_ab = -math.log(p(3, 3, 3))     # b follows a every time
    nll_ba = -math.log(p(1, 1, 3))
    want0 = round((2 * nll_ab + nll_ba) / 3, 6)
    assert got[0]["mean_nll"] == pytest.approx(want0, abs=1e-6)
    assert got[1]["mean_nll"] == pytest.approx(round(nll_ab, 6), abs=1e-6)


def test_bigram_surprisal_word_salad_scores_higher(spark):
    """Same vocabulary, different transition structure: the scrambled doc
    must out-surprise the repetitive fluent one — the signal a unigram
    LM cannot see."""
    from qvarn_mr_spark.functions.text import bigram_surprisal
    fluent = "the cat sat on the mat " * 5
    salad = "mat the on sat the cat cat mat sat on on the"
    df = spark.createDataFrame(
        [(0, fluent.strip()), (1, salad)], "doc_id long, text string")
    got = {r["doc_id"]: r["mean_nll"] for r in bigram_surprisal(df).collect()}
    assert got[1] > got[0]


def test_minhash_decontaminate_fuzzy(spark):
    """Near-duplicates of eval docs (band collisions) are flagged and
    dropped; unrelated docs survive; an exact copy collides on every
    band."""
    from qvarn_mr_spark.functions.quality import (
        minhash_contamination,
        minhash_decontaminate,
    )
    ev_text = ("the quick brown fox jumps over the lazy dog and then "
               "sits down to rest for a while")
    near = ev_text.replace("rest", "sleep")
    other = ("completely different content about spark shuffles and "
             "broadcast joins in adaptive execution plans")
    corpus = spark.createDataFrame(
        [(1, ev_text), (2, near), (3, other)],
        "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(100, ev_text)], "doc_id long, text string")
    flags = {r["doc_id"]: r["n_shared_bands"]
             for r in minhash_contamination(corpus, eval_df).collect()}
    from qvarn_mr_spark.functions.dedup import MINHASH_BANDS
    assert flags[1] == MINHASH_BANDS      # exact copy: every band
    assert flags.get(2, 0) >= 1           # near-dup: some band collides
    assert 3 not in flags                 # unrelated: no collision
    kept = sorted(r["doc_id"]
                  for r in minhash_decontaminate(corpus, eval_df).collect())
    assert kept == [3]
    # min_bands = all bands keeps the near-dup, drops only exact copies
    strict = sorted(r["doc_id"] for r in minhash_decontaminate(
        corpus, eval_df, min_bands=MINHASH_BANDS).collect())
    assert strict == [2, 3]


def test_unigram_surprisal_rare_words_score_higher(spark):
    from qvarn_mr_spark.functions.text import unigram_surprisal
    import math
    rows = [(i, "common words common words") for i in range(9)]
    rows.append((99, "zyzzyva qwyjibo"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_surprisal(df).collect()}
    assert got[99]["mean_nll"] > got[0]["mean_nll"]
    # exact hand value for the common docs: p = (c+0.5)/(N+0.5V),
    # c=18 each for 'common'/'words', N=38, V=4
    p = 18.5 / 40.0
    assert got[0]["mean_nll"] == pytest.approx(-math.log(p), abs=1e-6)
    assert got[0]["n_tokens"] == 4


def test_compression_ratio_orders_redundancy(spark):
    from qvarn_mr_spark.functions.quality import compression_ratio
    import hashlib
    noise = " ".join(hashlib.sha256(str(i).encode()).hexdigest()
                     for i in range(30))
    rows = [(0, "repeat me " * 200), (1, noise), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[0]["ratio"] < 0.05          # templated text crushes
    assert got[1]["ratio"] > 0.4           # hex noise stays high
    assert got[2]["ratio"] == 1.0 and got[2]["n_bytes"] == 0
    # exact value is pinned by stdlib zlib determinism
    import zlib
    raw = ("repeat me " * 200).encode()
    assert got[0]["ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 6)


def test_classifier_staged_features_match_flat(spark):
    """The staged training/scoring projections (_feature_frame /
    score_frame) must produce bit-identical values to the flat
    feature_exprs / score_expr forms — the staging is a plan-shape
    optimization, never a semantic fork."""
    from qvarn_mr_spark.functions import classifier as clf
    rows = [(0, "the cat and the dog is in the house!"),
            (1, "der hund und die katze, ist nicht ein tier"),
            (2, ""), (3, None), (4, "le chat est: une bete que")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = clf.feature_exprs()
    names = sorted(feats)
    flat = {r["doc_id"]: tuple(r[n] for n in names)
            for r in df.select(
                "doc_id",
                *[F.coalesce(feats[n], F.lit(0.0)).alias(n)
                  for n in names]).collect()}
    frame, names2 = clf._feature_frame(df, "text",
                                       {"doc_id": F.col("doc_id")})
    assert names2 == names
    staged = {r["doc_id"]: tuple(r[n] for n in names)
              for r in frame.collect()}
    assert staged == flat
    w = {n: 0.3 * (i + 1) for i, n in enumerate(names)}
    w["_bias"] = -0.7
    got = {r["doc_id"]: r["score"]
           for r in clf.score_frame(df, w).collect()}
    # score_frame == sigmoid(w·x + b) over the (coalesced) flat features
    # for EVERY row, including the NULL-text one
    for k, vals in flat.items():
        z = w["_bias"] + sum(w[n] * v for n, v in zip(names, vals))
        assert got[k] == pytest.approx(clf.sigmoid(z), abs=1e-6)


def test_classifier_null_features_local_equals_distributed(spark):
    """ADVICE r4: NULL featurized values must not fork the local numpy
    path (NaN poisoning) from the distributed path (silent NULL-skip) —
    both coalesce to 0.0 before the loop."""
    import math

    from qvarn_mr_spark.functions import classifier as clf
    rows = [(i, None if i % 3 == 0 else
             ("the cat and the dog " * ((i % 3) + 1)).strip(),
             int(i % 2)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    local = clf.train_logreg(df, F.col("y") == 1, iters=20, lr=1.0)
    dist = clf.train_logreg(df, F.col("y") == 1, iters=20, lr=1.0,
                            collect_threshold=0)
    for k in local:
        assert not math.isnan(local[k])
        assert local[k] == pytest.approx(dist[k], rel=1e-8, abs=1e-10)


def test_classifier_local_and_distributed_gd_agree(spark):
    """The Arrow-collected numpy loop and the per-iteration Spark
    aggregate loop implement the same math — weights must agree to
    float-reduction noise."""
    from qvarn_mr_spark.functions import classifier as clf
    rows = [(i, ("the cat and the dog " * ((i % 3) + 1)).strip(),
             int(i % 2)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    local = clf.train_logreg(df, F.col("y") == 1, iters=20, lr=1.0)
    dist = clf.train_logreg(df, F.col("y") == 1, iters=20, lr=1.0,
                            collect_threshold=0)
    assert sorted(local) == sorted(dist)
    for k in local:
        assert local[k] == pytest.approx(dist[k], rel=1e-8, abs=1e-10)


def test_trigram_surprisal_hand_values(spark):
    from qvarn_mr_spark.functions.text import trigram_surprisal
    import math
    # corpus: d0 = "a b c a b c" (triples abc, bca, cab, abc),
    # d1 = "a b c", d2 = "a b" (2 tokens -> absent)
    rows = [(0, "a b c a b c"), (1, "a b c"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in trigram_surprisal(df).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_trigrams"] == 4 and got[1]["n_trigrams"] == 1
    # trigram counts: abc=3, bca=1, cab=1; ctx ab=3, bc=1, ca=1
    # bigrams (all docs, incl. d2): ab=4, bc=3, ca=2; ctx a=4, b=3, c=2
    # unigrams: a=4? d0 has a,b,c twice (6 toks), d1 once, d2 a,b
    # -> a=4, b=4, c=3; N=11, V=3
    l3, l2, s = 0.5, 0.3, 0.5
    l1, n, v = 0.2, 11, 3

    def p(c_uvw, c_uv, c_vw, c_v, c_w):
        return (l3 * c_uvw / c_uv + l2 * c_vw / c_v
                + l1 * (c_w + s) / (n + s * v))

    nll_abc = -math.log(p(3, 3, 3, 3, 3))   # (u=a,v=b,w=c)
    nll_bca = -math.log(p(1, 1, 2, 2, 4))   # (u=b,v=c,w=a)
    nll_cab = -math.log(p(1, 1, 4, 4, 4))   # (u=c,v=a,w=b)
    want0 = round((2 * nll_abc + nll_bca + nll_cab) / 4, 6)
    assert got[0]["mean_nll"] == pytest.approx(want0, abs=1e-6)
    assert got[1]["mean_nll"] == pytest.approx(round(nll_abc, 6), abs=1e-6)


def test_trigram_surprisal_scrambled_scores_higher(spark):
    """Same bigram structure cannot be faked here: a doc whose WORD
    TRIPLES are novel out-surprises the repetitive fluent one even when
    individual transitions are common."""
    from qvarn_mr_spark.functions.text import trigram_surprisal
    fluent = "the cat sat on the mat " * 5
    scrambled = "the cat on sat the mat on the cat mat sat the"
    df = spark.createDataFrame(
        [(0, fluent.strip()), (1, scrambled)], "doc_id long, text string")
    got = {r["doc_id"]: r["mean_nll"]
           for r in trigram_surprisal(df).collect()}
    assert got[1] > got[0]


def test_cache_scope_releases_lm_pins(spark):
    """Operator-internal persists (the LM tables) must be dropped when a
    cache_scope exits, and left session-cached when no scope is active."""
    from qvarn_mr_spark.session import cache_scope
    from qvarn_mr_spark.functions.text import bigram_surprisal
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a b a")], "doc_id long, text string")
    with cache_scope() as scope:
        bigram_surprisal(df).collect()
        assert len(scope.pinned) == 2           # lm_bi + uni
        assert all(p.storageLevel.useMemory for p in scope.pinned)
    assert all(not p.storageLevel.useMemory for p in scope.pinned) \
        or not scope.pinned                      # released (list cleared)
    # nesting: inner scope releases its own pins only
    with cache_scope() as outer:
        bigram_surprisal(df).collect()
        n_outer = len(outer.pinned)
        with cache_scope() as inner:
            bigram_surprisal(df).collect()
            assert len(inner.pinned) == 2
        assert len(outer.pinned) == n_outer


def _ppl_corpus(spark):
    # two langs, sizes 7 and 5; rare-word docs get higher surprisal
    rows = []
    for i in range(7):
        rows.append((i, "common words " * (i + 1) + f"rare{i} " * i, "en"))
    for i in range(5):
        rows.append((100 + i, "palabras comunes " * 2 + f"raro{i} " * i,
                     "es"))
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_perplexity_buckets_ntile_matches_python_split(spark):
    """Bucket assignment == a Python ntile over the operator's own
    surprisal output ordered by (mean_nll, doc_id) — the LM itself is
    differentially tested elsewhere; this pins the split semantics."""
    from qvarn_mr_spark.functions.text import unigram_surprisal
    df = _ppl_corpus(spark)
    got = quality.perplexity_buckets(df).collect()
    sur = {r["doc_id"]: r["mean_nll"]
           for r in unigram_surprisal(df).collect()}
    langs = {r["doc_id"]: r["lang"] for r in df.collect()}
    expect = {}
    for lang in {"en", "es"}:
        ids = sorted((d for d in sur if langs[d] == lang),
                     key=lambda d: (sur[d], d))
        n, k = len(ids), 3
        base, extra = divmod(n, k)
        pos = 0
        for b in range(1, k + 1):
            size = base + (1 if b <= extra else 0)
            for d in ids[pos:pos + size]:
                expect[d] = b
            pos += size
    assert {r["doc_id"]: r["bucket"] for r in got} == expect
    labels = {r["bucket"]: r["bucket_label"] for r in got}
    assert labels == {1: "head", 2: "middle", 3: "tail"}
    # head docs are the most fluent (lowest surprisal) within each lang
    for lang in {"en", "es"}:
        rows = [r for r in got if r["lang"] == lang]
        assert (max(r["mean_nll"] for r in rows if r["bucket"] == 1)
                <= min(r["mean_nll"] for r in rows if r["bucket"] == 3))


def test_perplexity_buckets_thresholds_scale_path(spark):
    """The percentile-threshold form: monotone in surprisal, complete,
    every bucket populated, no per-group sort exactness required."""
    df = _ppl_corpus(spark)
    got = quality.perplexity_buckets(df, method="thresholds").collect()
    assert len(got) == 12 and {r["bucket"] for r in got} <= {1, 2, 3}
    for lang in {"en", "es"}:
        rows = sorted((r for r in got if r["lang"] == lang),
                      key=lambda r: (r["mean_nll"], r["doc_id"]))
        buckets = [r["bucket"] for r in rows]
        assert buckets == sorted(buckets)      # monotone step function
        assert {1, 2, 3} == set(buckets)       # all buckets non-empty


def test_perplexity_buckets_rejects_unknown_method(spark):
    df = _ppl_corpus(spark)
    with pytest.raises(ValueError, match="unknown method"):
        quality.perplexity_buckets(df, method="nope")


def test_c4_rule_profile_hand_cases(spark):
    from qvarn_mr_spark.functions.quality import c4_filter, c4_rule_profile
    docs = spark.createDataFrame([
        (1, "A clean page.\nIt has sentences ending properly.\n"
            "Five words in this line."),
        (2, "lorem ipsum dolor sit amet " * 10),
        (3, "function f() { return 1; }"),
        (4, "please read our privacy policy and terms of use"),
        (5, "buy viagra now " * 10),
        (6, "too short"),
    ], ["doc_id", "text"])
    prof = {r["doc_id"]: r for r in
            c4_rule_profile(docs, min_words=5).collect()}
    assert prof[1]["kept"] and prof[1]["frac_lines_terminal"] == 1.0
    assert prof[2]["has_lorem"] and not prof[2]["kept"]
    assert prof[3]["has_brace"] and not prof[3]["kept"]
    assert prof[4]["policy_hits"] == 2 and not prof[4]["kept"]
    assert prof[5]["has_blockword"] and not prof[5]["kept"]
    assert prof[6]["n_words"] == 2 and not prof[6]["kept"]
    kept_ids = [r["doc_id"] for r in
                c4_filter(docs, min_words=5).select("doc_id").collect()]
    assert kept_ids == [1]
    # line stats: doc 1 has 3 non-empty lines, all terminal, one with >=5
    assert prof[1]["frac_lines_ge5_words"] == pytest.approx(2 / 3, abs=1e-4)


def test_gopher_rules_hand_cases(spark):
    """Each Gopher signal trips on a crafted document and the composed
    verdict matches the paper's thresholds."""
    from qvarn_mr_spark.functions.quality import (gopher_filter,
                                                  gopher_rule_profile)
    good = ("the quick brown fox jumps over a lazy dog and we have "
            "plenty to be happy with of course " * 3)
    docs = spark.createDataFrame([
        (1, good),
        (2, "### " * 30 + good),                    # symbol ratio
        (3, "\n".join("• item %d here" % i for i in range(10))),  # bullets
        (4, "\n".join(("the story goes on..." if i else
                       "have that to be with of and the")
                      for i in range(10)) * 3),     # ellipsis lines
        (5, ("123 456 789 000 111 " * 12) + "the of"),  # alpha frac
        (6, "zebra quokka wombat lemur " * 15),     # no stopwords
    ], ["doc_id", "text"])
    prof = {r["doc_id"]: r
            for r in gopher_rule_profile(docs, min_words=20).collect()}
    assert prof[1]["kept"]
    assert prof[1]["n_stopwords"] >= 2
    assert not prof[2]["kept"] and prof[2]["symbol_word_ratio"] > 0.1
    assert not prof[3]["kept"] and prof[3]["frac_bullet_lines"] == 1.0
    assert not prof[4]["kept"] and prof[4]["frac_ellipsis_lines"] > 0.3
    assert not prof[5]["kept"] and prof[5]["frac_alpha_words"] < 0.8
    assert not prof[6]["kept"] and prof[6]["n_stopwords"] == 0
    kept_ids = sorted(r["doc_id"] for r in
                      gopher_filter(docs, min_words=20).collect())
    assert kept_ids == [1]


def test_paragraph_dedup_within_doc(spark):
    from qvarn_mr_spark.functions.quality import paragraph_dedup
    docs = spark.createDataFrame([
        (1, "chorus line\n\nverse one\n\nchorus line\n\nverse two\n\n"
            "Chorus Line "),          # normalized dup (case/trim) removed
        (2, "a\n\nunique one\n\na"),  # 'a' is structural (< min_chars): kept twice
        (3, "only paragraph"),
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text"] == "chorus line\n\nverse one\n\nverse two"
    assert out[1]["n_paras"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["text"] == "a\n\nunique one\n\na"
    assert out[2]["n_removed"] == 0
    assert out[3]["text"] == "only paragraph" and out[3]["n_removed"] == 0


def test_paragraph_dedup_regex_metachar_delimiter(spark):
    """The delimiter is a LITERAL string on both engines: Spark's
    F.split takes a Java regex, so metacharacters ('|', '.') must be
    quoted — and the result must match the DuckDB twin's literal
    string_split byte for byte."""
    import duckdb

    from qvarn_mr_spark.functions.quality import paragraph_dedup
    from qvarn_mr_spark.oracle import paragraph_dedup_sql

    rows = [(1, "dup|unique|dup|x.y"), (2, "a.b|a.b|solo")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["text"], r["n_paras"], r["n_removed"])
           for r in paragraph_dedup(docs, delimiter="|",
                                    min_chars=2).collect()}
    # unquoted '|' would be regex alternation -> char-by-char split
    assert got[1] == ("dup|unique|x.y", 4, 1)
    assert got[2] == ("a.b|solo", 3, 1)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                "(1, 'dup|unique|dup|x.y'), (2, 'a.b|a.b|solo')) "
                "t(doc_id, text)")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        paragraph_dedup_sql(delimiter="|", min_chars=2)).fetchall()}
    assert got == want


def test_serve_pin_bounds_bare_probe_persists(spark):
    """r12 (ADVICE r11): probe entry points called OUTSIDE any
    cache_scope must not leak one persisted frame per call — serve_pin
    keeps a FIFO capped at SERVE_PIN_BUDGET and unpersists the oldest
    beyond it. Inside a scope it defers to pin (scope releases)."""
    from qvarn_mr_spark import session as S

    budget_before = S.SERVE_PIN_BUDGET
    pins_before = list(S._SERVE_PINS)
    try:
        S.SERVE_PIN_BUDGET = 3
        S._SERVE_PINS.clear()
        frames = []
        for i in range(8):
            df = spark.range(i + 1).select("id")
            frames.append(S.serve_pin(df))
            df.count()
        assert len(S._SERVE_PINS) == 3
        # oldest 5 released, newest 3 still cached
        assert all(not f.storageLevel.useMemory for f in frames[:5])
        assert all(f.storageLevel.useMemory for f in frames[5:])
        # inside a scope: serve_pin == pin, scope releases on exit
        with S.cache_scope() as scope:
            g = S.serve_pin(spark.range(99).select("id"))
            g.count()
            assert scope.pinned == [g]
        assert not g.storageLevel.useMemory
        assert len(S._SERVE_PINS) == 3           # scope path bypassed FIFO
    finally:
        S.SERVE_PIN_BUDGET = budget_before
        for f in S._SERVE_PINS:
            f.unpersist(blocking=False)
        S._SERVE_PINS.clear()
        S._SERVE_PINS.extend(pins_before)


def test_serve_pin_thread_safe(spark):
    """r13 (ADVICE r12): the serve-pin FIFO is mutated by long-lived
    serving loops — concurrent probe builders (e.g. a reader thread next
    to index_cdc_bench's writer) must not race the append/evict section
    into over-popping or leaving the list above budget."""
    import threading

    from qvarn_mr_spark import session as S

    budget_before = S.SERVE_PIN_BUDGET
    pins_before = list(S._SERVE_PINS)
    errs: list = []
    try:
        S.SERVE_PIN_BUDGET = 4
        S._SERVE_PINS.clear()

        def worker():
            try:
                for i in range(25):
                    S.serve_pin(spark.range(1).select("id"))
            except Exception as e:              # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert len(S._SERVE_PINS) == 4          # exactly at budget
    finally:
        S.SERVE_PIN_BUDGET = budget_before
        for f in S._SERVE_PINS:
            f.unpersist(blocking=False)
        S._SERVE_PINS.clear()
        S._SERVE_PINS.extend(pins_before)


def test_dispatch_fingerprint_collision_guard():
    """r13 (ADVICE r12): committed-artifact dispatch builders dedup on
    the FINGERPRINT alone — one fingerprint mapping to conflicting
    payloads (a weak-fingerprint collision across md5-distinct sidecar
    datasets) must raise instead of emitting two matching dispatch
    branches that double/mix the output rows."""
    from qvarn_mr_spark import oracle

    # exact duplicates collapse
    ents = oracle._dedup_fp_entries([((1, 2, 3), 5), ((1, 2, 3), 5)], "t")
    assert ents == [((1, 2, 3), 5)]
    # conflicting payloads raise (pagerank shape: payload = int N)
    with pytest.raises(ValueError, match="conflicting"):
        oracle._dedup_fp_entries([((1, 2, 3), 5), ((1, 2, 3), 7)], "t")
    # bpe shape: payload = list of pairs; list vs tuple spelling is
    # canonicalized before comparison
    ents = oracle._dedup_fp_entries(
        [((1, 2), [("a", "b")]), ((1, 2), [("a", "b")])], "t")
    assert len(ents) == 1
    with pytest.raises(ValueError, match="conflicting"):
        oracle._dedup_fp_entries(
            [((1, 2), [("a", "b")]), ((1, 2), [("a", "c")])], "t")
    # end-to-end: the pagerank builder itself trips on the collision
    with pytest.raises(ValueError, match="pagerank_converged"):
        oracle.pagerank_converged_dispatch_sql(
            [((1, 2, 3), 4), ((1, 2, 3), 6)], oracle.CS_EDGES_SQL)
    # ppl-cuts shape: payload = {lang: [cuts]} dicts compare by value
    ents = oracle._dedup_fp_entries(
        [((1, 2), {"en": [1.0]}), ((1, 2), {"en": [1.0]})], "t")
    assert len(ents) == 1
    with pytest.raises(ValueError, match="perplexity_buckets"):
        oracle.perplexity_buckets_dispatch_sql(
            [((1, 2), {"en": [1.0, 2.0]}), ((1, 2), {"en": [1.0, 3.0]})])


def test_perplexity_buckets_dispatch_sql():
    """r13 (VERDICT r12 #3): the committed-cuts oracle recomputes the
    surprisal scores LIVE and re-derives bucket = 1 + #cuts below the
    score; only the cut doubles are echoed. Checked on a toy corpus
    whose unigram scores are hand-orderable: the matching-fingerprint
    branch reproduces the threshold assignment, a wrong fingerprint
    yields zero rows (honest mismatch), and a language missing from the
    sidecar drops its rows via the inner join."""
    import duckdb

    from qvarn_mr_spark import oracle

    con = duckdb.connect()
    con.execute("""CREATE TABLE documents AS SELECT * FROM (VALUES
        (1, 'en', 'aa aa aa aa'), (2, 'en', 'aa aa aa zz'),
        (3, 'en', 'aa zz yy xx'), (4, 'de', 'aa aa aa aa'),
        (5, 'de', 'zz yy xx ww')) AS t(doc_id, lang, text)""")
    n, slen = con.execute(
        "SELECT count(*), CAST(sum(length(text)) AS BIGINT) "
        "FROM documents").fetchone()
    sur = {row[0]: row[2] for row in con.execute(
        oracle.unigram_surprisal_sql()).fetchall()}
    # cuts straddling the observed scores: doc1/doc4 (all-'aa') lowest
    lo, hi = sorted(sur.values())[0], sorted(sur.values())[-1]
    cuts = {"en": [lo, (lo + hi) / 2], "de": [lo, (lo + hi) / 2]}
    sql = oracle.perplexity_buckets_dispatch_sql(
        [((n, slen), cuts)])
    got = {d: (b, bl) for d, _, _, _, b, bl in
           con.execute(sql).fetchall()}
    want = {d: 1 + sum(1 for c in cuts["en"] if m > c)
            for d, m in sur.items()}
    assert {d: b for d, (b, _) in got.items()} == want
    labels = {1: "head", 2: "middle", 3: "tail"}
    assert all(bl == labels[b] for b, bl in got.values())
    # wrong fingerprint -> empty (honest row-count mismatch)
    miss = oracle.perplexity_buckets_dispatch_sql(
        [((n + 1, slen), cuts)])
    assert con.execute(miss).fetchall() == []
    # language absent from the sidecar -> its rows drop
    part = oracle.perplexity_buckets_dispatch_sql(
        [((n, slen), {"en": cuts["en"]})])
    assert {r[0] for r in con.execute(part).fetchall()} == {1, 2, 3}
