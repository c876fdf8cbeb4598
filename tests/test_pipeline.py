"""corpus_prepare: the composed profile→filter→dedup→split pass."""

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.functions.pipeline import corpus_prepare, corpus_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir, tables=("documents",))["documents"]


def test_prepare_on_testdata_is_deterministic_and_consistent(spark, docs):
    a = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                       min_tokens=1)
    b = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                       min_tokens=1)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) > 0
    # survivors are a subset of the input, each id once
    ids = [r[0] for r in ra]
    assert len(ids) == len(set(ids))
    n_in = docs.count()
    assert len(ids) <= n_in
    # every row carries a split from the declared set
    cols = a.columns
    splits = {r[cols.index("split")] for r in ra}
    assert splits <= {"train", "val", "test"}
    # gate accounting adds up: canonical docs + absorbed duplicates can
    # never exceed the input
    st = corpus_stats(docs, a).collect()
    total_kept = sum(r["n_docs"] for r in st)
    total_absorbed = sum(r["n_absorbed"] for r in st)
    assert total_kept == len(ids)
    assert total_kept + total_absorbed <= n_in
    assert all(r["n_input"] == n_in for r in st)


def test_prepare_collapses_near_duplicates(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the quiet green forest before the sun sets")
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("quiet", "silent")),        # near dup of 1
        (4, "completely different text about spark shuffles and "
            "partitions and the cost of wide transformations at scale"),
        (5, "tiny"),                                 # fails min_tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                         min_tokens=5, jaccard_threshold=0.5)
    got = {r["doc_id"]: r["n_duplicates"] for r in out.collect()}
    # doc 1 is canonical (smallest id) absorbing 2 and 3; 4 unique; 5 gone
    assert set(got) == {1, 4}
    assert got[1] == 2
    assert got[4] == 0


def test_prepare_filters_are_applied_before_dedup(spark):
    """A low-quality near-duplicate must not influence clustering (the
    filter gates the dedup input, not just the output)."""
    base = ("one sentence that is long enough to pass the token floor "
            "and repeated across documents for duplication purposes here")
    docs = spark.createDataFrame(
        [(1, base), (2, "zz zz zz zz zz !!!! ???? @@@@ %%%% ^^^^ &&&&")],
        "doc_id long, text string")
    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.35,
                         min_tokens=5)
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1}


def test_prepare_repetition_gates(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the quiet green forest before the sun sets")
    spam = "buy now " * 30                     # two words repeated 30x
    df = spark.createDataFrame(
        [("1", base), ("2", spam)], "doc_id string, text string")
    # without gates the spammy doc survives
    plain = {r["doc_id"] for r in corpus_prepare(
        df, min_quality=0.0, min_tokens=1).collect()}
    assert plain == {"1", "2"}
    gated = {r["doc_id"] for r in corpus_prepare(
        df, min_quality=0.0, min_tokens=1,
        max_dup_word_frac=0.5, max_top_word_frac=0.4).collect()}
    assert gated == {"1"}
    # gate columns must not leak into the output schema
    out = corpus_prepare(df, min_quality=0.0, min_tokens=1,
                         max_dup_word_frac=0.5)
    assert not [c for c in out.columns if c.startswith("_")]


def test_prepare_decontaminates_against_eval_set(spark):
    overlap = ("alpha beta gamma delta shares a benchmark span with the "
               "held out evaluation document here")
    clean = ("completely different content about rivers mountains and "
             "weather patterns across seasons")
    df = spark.createDataFrame(
        [("1", overlap), ("2", clean)], "doc_id string, text string")
    ev = spark.createDataFrame(
        [("e1", "alpha beta gamma delta appears verbatim")],
        "doc_id string, text string")
    plain = {r["doc_id"] for r in corpus_prepare(
        df, min_quality=0.0, min_tokens=1).collect()}
    assert plain == {"1", "2"}
    got = {r["doc_id"] for r in corpus_prepare(
        df, min_quality=0.0, min_tokens=1,
        decontaminate_against=ev, decontam_k=4).collect()}
    assert got == {"2"}


def test_corpus_prepare_line_strip_gate(spark):
    from qvarn_mr_spark.functions.pipeline import corpus_prepare
    # shared boilerplate word in EVERY doc; unique payload after it
    rows = [(i, "boilerplate unique%d filler%d words%d here%d now%d ok%d"
             % (i, i, i, i, i, i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = corpus_prepare(df, min_quality=0.0, min_tokens=2)
    stripped = corpus_prepare(df, min_quality=0.0, min_tokens=2,
                              strip_lines_min_frac=0.9,
                              line_delimiter=" ")
    nb = {r["doc_id"]: r["n_tokens"] for r in base.collect()}
    ns = {r["doc_id"]: r["n_tokens"] for r in stripped.collect()}
    assert set(nb) == set(ns)                # no doc lost, all unique
    # the boilerplate token is gone from every doc's profile
    assert all(ns[d] == nb[d] - 1 for d in nb)


def test_line_dedup_idempotent(spark):
    from qvarn_mr_spark.functions.quality import line_dedup
    rows = [(i, "shared header\nbody %d\nshared footer" % i)
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = line_dedup(df, min_docs=2)
    twice = line_dedup(once, min_docs=2)
    a = sorted(map(tuple, once.collect()))
    b = sorted((r["doc_id"], r["text"]) for r in twice.collect())
    assert [(d, t) for d, t, *_ in a] == b
    assert all(r["n_removed"] == 0 for r in twice.collect())


def test_corpus_prepare_classifier_gate(spark):
    from qvarn_mr_spark.functions import classifier as clf
    from qvarn_mr_spark.functions.pipeline import corpus_prepare
    # unique trigrams per doc so the dedup stage keeps all of them
    en = [(i, "the cat and the dog w%da x%db y%dc z%dd" % (i, i, i, i))
          for i in range(8)]
    de = [(100 + i, "der hund und die katze p%da q%db r%dc s%dd"
           % (i, i, i, i)) for i in range(8)]
    df = spark.createDataFrame(en + de, "doc_id long, text string")
    w = clf.train_logreg(df, F.col("doc_id") < 100, iters=60, lr=1.0)
    base = corpus_prepare(df, min_quality=0.0, min_tokens=2)
    gated = corpus_prepare(df, min_quality=0.0, min_tokens=2,
                           classifier_weights=w)
    assert base.count() == 16
    kept = sorted(r["doc_id"] for r in gated.collect())
    assert kept == [i for i, _ in en]      # only the positive class


@pytest.mark.sweep
def test_corpus_prepare_dsir_gate(spark, docs):
    """The DSIR gate must equal the manual composition: gate → dsir_resample
    top-k on the gated survivors → corpus_prepare restricted to the picks."""
    from qvarn_mr_spark.functions.sampling import dsir_resample
    from qvarn_mr_spark.functions.text import profile_frame

    target = docs.filter(F.col("lang") == "en")
    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                         min_tokens=2, dsir_target=target, dsir_k=50)
    got_ids = {r["doc_id"] for r in out.collect()}

    # manual composition with the same salt framing
    prof = profile_frame(
        docs.select("doc_id", "text"), "text", ("doc_id",),
        keep_text=True)
    kept = prof.filter((F.col("quality") >= 0.0)
                       & F.col("n_tokens").between(2, 100_000)) \
               .select("doc_id", F.col("_text").alias("text"))
    picks = {r["doc_id"] for r in dsir_resample(
        kept, target.select("doc_id", "text"), k=50,
        salt="corpus-dsir").collect()}
    assert len(picks) == 50
    # output = canonical survivors of the picked set
    assert got_ids <= picks
    base = corpus_prepare(
        docs.join(spark.createDataFrame([(i,) for i in sorted(picks)],
                                        "doc_id string"), "doc_id"),
        "doc_id", "text", min_quality=0.0, min_tokens=2)
    assert got_ids == {r["doc_id"] for r in base.collect()}


def test_corpus_prepare_dsir_requires_k_or_frac(spark, docs):
    target = docs.limit(5)
    with pytest.raises(ValueError, match="dsir_k or dsir_frac"):
        corpus_prepare(docs, dsir_target=target).collect()


@pytest.mark.sweep
def test_corpus_funnel_counts(spark, docs):
    """Funnel stage counts are monotone non-increasing and agree with
    the stage operators run independently."""
    from qvarn_mr_spark.functions.pipeline import corpus_funnel

    target = docs.filter(F.col("lang") == "en")
    rows = {r["stage"]: (r["stage_idx"], r["n_docs"])
            for r in corpus_funnel(docs, "doc_id", "text",
                                   min_quality=0.0, min_tokens=2,
                                   dsir_target=target, dsir_k=50)
            .collect()}
    assert list(rows) == ["input", "gates", "dsir", "canonical"]
    idxs = [rows[s][0] for s in rows]
    assert idxs == sorted(idxs)
    counts = [rows[s][1] for s in ("input", "gates", "dsir", "canonical")]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows["dsir"][1] == 50
    # canonical count equals the DSIR-gated corpus_prepare's row count
    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                         min_tokens=2, dsir_target=target, dsir_k=50)
    assert rows["canonical"][1] == out.count()


def test_corpus_prepare_gopher_gate(spark, docs):
    """The Gopher gate must equal the manual composition (gates →
    gopher_filter on the gated survivors → prepare restricted to the
    keeps) and show up as a funnel stage in order."""
    from qvarn_mr_spark.functions.pipeline import corpus_funnel
    from qvarn_mr_spark.functions.quality import gopher_filter

    gated = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                           min_tokens=2, gopher_min_words=20,
                           gopher_min_stopwords=1)
    manual_keep = {
        r["doc_id"] for r in gopher_filter(
            docs, text_col="text", min_words=20,
            min_stopwords=1).collect()}
    base = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                          min_tokens=2)
    got_ids = {r["doc_id"] for r in gated.collect()}
    # the gate can only shrink the base output, and every survivor
    # passes the standalone filter
    assert got_ids <= {r["doc_id"] for r in base.collect()}
    assert got_ids <= manual_keep
    assert 0 < len(got_ids)
    rows = [r["stage"] for r in corpus_funnel(
        docs, "doc_id", "text", min_quality=0.0, min_tokens=2,
        c4_min_words=5, gopher_min_words=20,
        gopher_min_stopwords=1).collect()]
    assert rows == ["input", "gates", "c4", "gopher", "canonical"]


@pytest.mark.sweep
def test_corpus_prepare_perplexity_gate(spark, docs):
    """The CCNet perplexity gate must equal the manual composition:
    gates → perplexity_buckets(keep head+middle) on the gated
    survivors → corpus_prepare restricted to the keeps."""
    from qvarn_mr_spark.functions.quality import perplexity_buckets
    from qvarn_mr_spark.functions.text import profile_frame

    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                         min_tokens=2, perplexity_keep_buckets=2)
    got_ids = {r["doc_id"] for r in out.collect()}

    prof = profile_frame(
        docs.select("doc_id", "text"), "text", ("doc_id",),
        keep_text=True)
    kept = prof.filter((F.col("quality") >= 0.0)
                       & F.col("n_tokens").between(2, 100_000)) \
               .select("doc_id", F.col("_text").alias("text"),
                       F.col("lang_guess").alias("lang"))
    keeps = {r["doc_id"] for r in perplexity_buckets(kept)
             .filter(F.col("bucket") <= 2).collect()}
    assert got_ids <= keeps
    base = corpus_prepare(
        docs.join(spark.createDataFrame([(i,) for i in sorted(keeps)],
                                        "doc_id long"), "doc_id"),
        "doc_id", "text", min_quality=0.0, min_tokens=2)
    assert got_ids == {r["doc_id"] for r in base.collect()}
    # tail bucket really removed: keep fraction ~ 2/3 of gate survivors
    n_kept = kept.count()
    assert len(keeps) < n_kept
    assert abs(len(keeps) - 2 * n_kept / 3) <= docs.select(
        "lang").distinct().count() + 1


def test_corpus_funnel_perplexity_stage(spark, docs):
    from qvarn_mr_spark.functions.pipeline import corpus_funnel

    rows = {r["stage"]: r["n_docs"]
            for r in corpus_funnel(docs, "doc_id", "text",
                                   min_quality=0.0, min_tokens=2,
                                   perplexity_keep_buckets=2).collect()}
    assert list(rows) == ["input", "gates", "perplexity", "canonical"]
    counts = list(rows.values())
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    out = corpus_prepare(docs, "doc_id", "text", min_quality=0.0,
                         min_tokens=2, perplexity_keep_buckets=2)
    assert rows["canonical"] == out.count()


def test_corpus_prepare_c4_gate(spark):
    from qvarn_mr_spark.functions.pipeline import corpus_funnel, corpus_prepare
    clean = [(i, "the quick brown fox w%da x%db y%dc z%dd and more "
                 "words to clear the floor." % (i, i, i, i))
             for i in range(6)]
    dirty = [
        (100, "lorem ipsum dolor " + "pad%d " % 1 * 12),
        (101, "code sample { return 1; } " + " ".join(
            "tok%d" % j for j in range(12))),
        (102, "please accept our privacy policy " + " ".join(
            "unq%d" % j for j in range(10))),
    ]
    df = spark.createDataFrame(clean + dirty, "doc_id long, text string")
    base = corpus_prepare(df, min_quality=0.0, min_tokens=2)
    gated = corpus_prepare(df, min_quality=0.0, min_tokens=2,
                           c4_min_words=5)
    assert base.count() == 9
    assert sorted(r["doc_id"] for r in gated.collect()) == \
        [i for i, _ in clean]
    # funnel accounting exposes the c4 stage between gates and canonical
    funnel = {r["stage"]: r["n_docs"]
              for r in corpus_funnel(df, min_quality=0.0, min_tokens=2,
                                     c4_min_words=5).collect()}
    assert funnel["input"] == 9
    assert funnel["gates"] == 9
    assert funnel["c4"] == 6
    assert funnel["canonical"] == 6


def test_corpus_gate_stream_c4_matches_batch(spark, tmp_path):
    """The C4 rules are stateless Columns, so the streamed gate with
    c4_min_words must keep exactly the docs batch c4_filter keeps (after
    the shared quality/token gates)."""
    import glob
    import shutil

    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream
    from qvarn_mr_spark.functions.quality import c4_filter

    rows = [
        ("k1", "the quick brown fox jumps over the lazy dog in the sun."),
        ("k2", "a man of the people told the story for all of the town."),
        ("x1", "lorem ipsum dolor sit amet the quick brown fox again ok"),
        ("x2", "code { the quick brown fox jumps over the lazy dog } ok"),
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))

    arrived = []
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=3,
                            c4_min_words=5)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = sorted(r["doc_id"] for r in arrived)
    batch = sorted(r["doc_id"] for r in
                   c4_filter(df, min_words=5).select("doc_id").collect())
    assert streamed == batch == ["k1", "k2"]


def test_corpus_gate_stream_gopher_matches_batch(spark, tmp_path):
    """VERDICT r8 item 2: gopher_signals are stateless Columns too, so
    the streamed gate with gopher_min_words must keep exactly the docs
    batch gopher_filter keeps (after the shared quality/token gates) —
    mirrors the C4 conformance test above."""
    import glob
    import shutil

    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream
    from qvarn_mr_spark.functions.quality import gopher_filter

    rows = [
        # passes: enough words, stopwords, sane word lengths
        ("k1", "the quick brown fox jumps over the lazy dog in the sun "
               "and then the dog ran back to the house for some food."),
        ("k2", "a man of the people told the story for all of the town "
               "and they all listened to it with great joy and wonder."),
        # fails min_words (short)
        ("x1", "the quick brown fox jumps here."),
        # fails symbol ratio (hash/ellipsis soup)
        ("x2", "the # fox # ran # over # the # dog # and # the # cat # "
               "sat # on # the # mat # near # the # old # barn # now #"),
        # fails stopword count (no common stopwords)
        ("x3", "quantum flux resonator calibrates phased tachyon grid "
               "metrics beyond nominal thresholds during diagnostics "
               "sweep cycles across redundant subsystem arrays daily."),
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))

    arrived = []
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=3,
                            gopher_min_words=15)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = sorted(r["doc_id"] for r in arrived)
    batch = sorted(r["doc_id"] for r in
                   gopher_filter(df, min_words=15)
                   .select("doc_id").collect())
    assert streamed == batch == ["k1", "k2"]


def test_batch_word_ceiling_matches_stream_gates(spark):
    """ADVICE r9: _gate_flow's c4/gopher stages must disengage the
    word ceiling exactly like corpus_gate_stream does (the pipelines'
    token band is the size cap) — a >100k-whitespace-word document
    inside a widened token band survives the batch c4+gopher stages."""
    from qvarn_mr_spark.functions.pipeline import corpus_funnel

    big = " ".join(
        ["the quick brown fox jumps over the lazy dog and that "
         "dog ran with joy to be of use."] * 6000)   # 114k words
    small = ("the quick brown fox jumps over the lazy dog in the sun "
             "and then the dog ran back to the house for some food.")
    df = spark.createDataFrame([(1, big), (2, small)],
                               "doc_id long, text string")
    fun = corpus_funnel(df, min_quality=0.0, min_tokens=3,
                        max_tokens=10 ** 7, c4_min_words=5,
                        gopher_min_words=5)
    counts = {r["stage"]: r["n_docs"] for r in fun.collect()}
    assert counts["gates"] == 2
    assert counts["c4"] == 2        # was 1: c4 default 100k-word cap
    assert counts["gopher"] == 2    # was 1: gopher default cap
    assert counts["canonical"] == 2


def test_corpus_gate_stream_classifier_matches_batch(spark, tmp_path):
    """r10: the classifier gate joins the streaming path — score_expr
    is a pure sigmoid Column, so the streamed gate with fixed weights
    must keep exactly the docs the batch classifier_filter keeps
    (after the shared quality/token gates) — mirrors the C4/Gopher
    conformance tests above."""
    import glob
    import shutil

    from qvarn_mr_spark.functions.classifier import classifier_filter
    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream

    # handcrafted deterministic model: long stopword-rich prose scores
    # high, punctuation soup scores low
    weights = {"_bias": -2.0, "len_score": 2.5, "stopword": 6.0,
               "punct": -8.0}
    rows = [
        ("k1", "the quick brown fox jumps over the lazy dog and then "
               "the dog ran back to the house for some good food there"),
        ("k2", "a man of the people told the story for all of the town "
               "and they all listened to it with great joy and wonder"),
        ("x1", "..!!..??..!!..??..!!..??..!!..??..!!..??..!!..??..!!.."
               "!!..??..!!..??..!!..??..!!..??..!!..??..!!..??..!!..??"),
        ("x2", "wqzx vbnk jlpr tsgh dmfc wqzx vbnk jlpr tsgh dmfc wqzx "
               "vbnk jlpr tsgh dmfc wqzx vbnk jlpr tsgh dmfc wqzx vbnk"),
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))

    arrived = []
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=3,
                            classifier_weights=weights,
                            classifier_threshold=0.5)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = sorted(r["doc_id"] for r in arrived)
    batch = sorted(r["doc_id"] for r in
                   classifier_filter(df, weights, threshold=0.5)
                   .select("doc_id").collect())
    assert streamed == batch == ["k1", "k2"]


def test_corpus_gate_stream_lsh_matches_batch(spark, tmp_path):
    """r13 (VERDICT r12 #7): the streaming near-dup gate — per-band
    stream-static LEFT ANTI joins against the maintained LSH index —
    must drop exactly the docs the foreachBatch twin lsh_gate_batch
    drops: any doc sharing a band bucket with a DIFFERENT indexed doc
    dies, a doc colliding only with its own index entry survives
    (self-exclusion), a novel doc survives, and a doc too short to
    shingle passes through ungated."""
    import glob
    import shutil

    from qvarn_mr_spark.functions import dedup
    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream

    indexed = [
        ("i1", "the quick brown fox jumps over the lazy dog in the sun "
               "and then the dog ran back to the house for some food"),
        ("i2", "a man of the people told the story for all of the town "
               "and they all listened to it with great joy and wonder"),
    ]
    corpus = spark.createDataFrame(indexed, "doc_id string, text string")
    # the normalized maintained-index representation: one
    # (_mr_key = band_bucket, _mr_value = doc_id) row per (doc, band)
    index = corpus.select(
        F.col("doc_id").alias("_mr_value"),
        F.explode(dedup.minhash_band_keys_col("text")).alias("_mr_key"))
    rows = [
        # near-dup of indexed i1 (identical text -> every band collides)
        ("x1", indexed[0][1]),
        # SAME id as its own index entry -> only self-collisions: kept
        ("i2", indexed[1][1]),
        # novel text: kept
        ("k1", "colorless green ideas sleep furiously under the bright "
               "red moon while seven silent ships sail slowly home now"),
        # too short to shingle (2 tokens < SHINGLE_K): passes ungated
        ("k2", "hello world"),
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))

    arrived = []
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=1,
                            lsh_index=index)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    streamed = sorted(r["doc_id"] for r in arrived)
    batch = sorted(r["doc_id"] for r in
                   dedup.lsh_gate_batch(df, index)
                   .select("doc_id").collect())
    assert streamed == batch == ["i2", "k1", "k2"]


def test_corpus_gate_stream_lsh_with_watermark(spark, tmp_path):
    """The LSH gate composes with the watermarked fp-dedup form: the
    per-band stream-static anti-joins sit AFTER
    dropDuplicatesWithinWatermark in the plan, and the combination must
    still run in append mode (stateless joins after a stateful op) and
    keep/drop the same docs."""
    import glob
    import shutil

    from qvarn_mr_spark.functions import dedup
    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream

    indexed = [("i1", "the quick brown fox jumps over the lazy dog in "
                      "the sun and then the dog ran back to the house")]
    corpus = spark.createDataFrame(indexed, "doc_id string, text string")
    index = corpus.select(
        F.col("doc_id").alias("_mr_value"),
        F.explode(dedup.minhash_band_keys_col("text")).alias("_mr_key"))
    rows = [
        ("x1", indexed[0][1], "2024-01-01 10:00:00"),   # near-dup: drop
        ("k1", "colorless green ideas sleep furiously under the bright "
               "red moon while seven silent ships sail slowly home",
         "2024-01-01 10:00:05"),                        # novel: keep
        ("k2", "colorless green ideas sleep furiously under the bright "
               "red moon while seven silent ships sail slowly home",
         "2024-01-01 10:00:09"),                        # exact dup: drop
    ]
    feed = tmp_path / "feed"
    feed.mkdir()
    df = spark.createDataFrame(
        rows, "doc_id string, text string, ts_s string").select(
        "doc_id", "text", F.to_timestamp("ts_s").alias("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))

    arrived = []
    stream = spark.readStream \
        .schema("doc_id string, text string, ts timestamp") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=1,
                            lsh_index=index, watermark="10 minutes",
                            ts_col="ts")
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # x1 dies at the LSH gate; exactly ONE of the exact-dup pair
    # survives the fp dedup (first-seen within the batch)
    got = sorted(r["doc_id"] for r in arrived)
    assert len(got) == 1 and got[0] in ("k1", "k2"), got


def test_unigram_surprisal_stream_matches_batch(spark, sf_dir):
    """r10: the exported-LM streaming scorer must reproduce the batch
    unigram_surprisal value-for-value on in-vocabulary documents (LM
    fitted on the same corpus it scores — the batch form's setting),
    and score OOV tokens finitely through the smoothing mass."""
    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.text import (export_unigram_lm,
                                               unigram_surprisal,
                                               unigram_surprisal_stream)
    docs = load_tables(spark, sf_dir, ["documents"])["documents"] \
        .limit(200)
    lm = export_unigram_lm(docs)
    want = {r["doc_id"]: (r["n_tokens"], r["mean_nll"])
            for r in unigram_surprisal(docs).collect()}
    got = {r["doc_id"]: (r["n_tokens"], r["mean_nll"])
           for r in unigram_surprisal_stream(docs, lm).collect()}
    assert got == want and len(got) > 0

    # OOV doc: every token unseen — finite score via smoothing mass
    import math
    oov = spark.createDataFrame([(999999, "zzqx wvvk pplm")],
                                "doc_id long, text string")
    r = unigram_surprisal_stream(oov, lm).collect()[0]
    assert r["n_tokens"] == 3
    expect = round(-math.log(lm["smoothing"]
                             / (lm["N"] + lm["smoothing"] * lm["V"])), 6)
    assert abs(r["mean_nll"] - expect) < 1e-6

    # keep= passthrough preserves payload columns
    kept = unigram_surprisal_stream(
        docs.withColumn("tag", F.lit("x")), lm,
        keep=("text", "tag")).columns
    assert kept == ["doc_id", "text", "tag", "n_tokens", "mean_nll"]


def test_corpus_gate_stream_surprisal_matches_batch(spark, tmp_path):
    """r10: the streamed perplexity gate (pinned exported LM) must keep
    exactly the docs whose batch unigram surprisal clears the cap,
    after the shared quality/token gates — and both-or-neither arg
    validation holds."""
    import glob
    import shutil

    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream
    from qvarn_mr_spark.functions.text import (export_unigram_lm,
                                               unigram_surprisal)

    fluent = ("the quick brown fox jumps over the lazy dog and then "
              "the dog ran back to the house for some food there")
    rows = [
        ("k1", fluent),
        ("k2", "a man of the people told the story for all of the town "
               "and they all listened to it with great joy"),
        # rare-vocabulary salad: high surprisal under the fitted LM
        ("x1", "zzqx wvvk pplm drrt hhnn bbvc kkjl mmty reew qqas"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    lm = export_unigram_lm(df)
    nll = {r["doc_id"]: r["mean_nll"]
           for r in unigram_surprisal(df).collect()}
    cap = (nll["k1"] + nll["x1"]) / 2          # between prose and salad
    assert nll["k2"] <= cap < nll["x1"]

    feed = tmp_path / "feed"
    feed.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp"))
    for i, f in enumerate(glob.glob(str(tmp_path / "tmp" / "*.parquet"))):
        shutil.move(f, str(feed / f"b-{i}.parquet"))
    arrived = []
    stream = spark.readStream.schema("doc_id string, text string") \
        .parquet(str(feed))
    q = (corpus_gate_stream(stream, min_quality=0.0, min_tokens=3,
                            surprisal_lm=lm, max_mean_nll=cap)
         .writeStream.outputMode("append")
         .foreachBatch(lambda b, _: arrived.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert sorted(r["doc_id"] for r in arrived) == ["k1", "k2"]
    # the gate's own n_tokens column survives the scorer round-trip
    assert all(r["n_tokens"] > 0 for r in arrived)

    with pytest.raises(ValueError, match="go together"):
        corpus_gate_stream(stream, surprisal_lm=lm)


def test_corpus_gate_stream_surprisal_keeps_unscorable_docs(spark):
    """ADVICE r10: a doc whose WORD tokenization is empty (symbol-only
    text that still clears the whitespace-token band) must pass the
    surprisal stage UNSCORED, not silently vanish — the gate only drops
    what a rule rejected. Stateless stages, so a batch frame exercises
    the same plan the stream runs."""
    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream
    from qvarn_mr_spark.functions.text import export_unigram_lm

    fluent = ("the quick brown fox jumps over the lazy dog and then "
              "the dog ran back to the house for some food there")
    df = spark.createDataFrame(
        [("k1", fluent), ("sym", "§§ ¶¶ •• §§ ¶¶ •• §§ ¶¶ ••")],
        "doc_id string, text string")
    lm = export_unigram_lm(df.filter(F.col("doc_id") == "k1"))
    out = corpus_gate_stream(df, min_quality=0.0, min_tokens=3,
                             surprisal_lm=lm, max_mean_nll=100.0)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert set(got) == {"k1", "sym"}       # unscorable doc passed through
    assert got["sym"] == 9                 # band's own token count intact
