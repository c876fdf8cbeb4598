"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5: "no property-based/randomized testing").

Each property checks a Spark operator against an independent pure-Python
model on randomized inputs: the search surface vs a naive row filter, and
the dedup primitives vs set arithmetic.
"""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qvarn_mr_spark.functions import dedup
from qvarn_mr_spark.query import search

WORDS = ["spark", "table", "row", "key", "value", "scan", "merge", "the", "a"]
texts = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
names = st.text(alphabet="abcXYZ ", min_size=0, max_size=8)


def _tokens(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def _shingles(s, k=3):
    t = _tokens(s)
    return {" ".join(t[i:i + k]) for i in range(len(t) - k + 1)}


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(rows, schema):
        return spark.createDataFrame(rows, schema)
    return make


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(names, min_size=1, max_size=6), names)
def test_search_exact_matches_python_model(mk_df, vals, needle):
    df = mk_df([(i, v) for i, v in enumerate(vals)], "id long, name string")
    got = sorted(r["id"] for r in search(df, name=needle).collect())
    want = sorted(i for i, v in enumerate(vals)
                  if v.lower() == needle.lower())
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=5))
def test_shingle_table_matches_python_model(mk_df, docs):
    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    got = {}
    for r in dedup.shingle_table(df, "doc_id", "text").collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    want = {i: _shingles(d) for i, d in enumerate(docs) if _shingles(d)}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=2, max_size=5))
def test_jaccard_matches_set_arithmetic(mk_df, docs):
    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): (r["n_common"], r["jaccard"])
           for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text",
                                              min_common=1).collect()}
    sh = {i: _shingles(d) for i, d in enumerate(docs)}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                common = len(sh[a] & sh[b])
                if common >= 1:
                    n, j = got[(a, b)]
                    assert n == common
                    assert j == round(common / len(sh[a] | sh[b]), 6)
                else:
                    assert (a, b) not in got


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=4))
def test_simhash_is_permutation_invariant(mk_df, docs):
    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    base = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(df, "doc_id", "text").collect()}
    shuffled = [" ".join(reversed(d.split())) for d in docs]
    df2 = mk_df(list(enumerate(shuffled)), "doc_id long, text string")
    perm = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(df2, "doc_id", "text").collect()}
    # token-set semantics: word order never changes the signature
    assert base == perm


# -- the IVM contract: incremental ≡ recompute -------------------------------

ops_strategy = st.lists(
    st.tuples(st.sampled_from(["upsert", "delete"]),
              st.integers(0, 5),                      # resource id
              st.integers(1, 3),                      # key
              st.integers(0, 9)),                     # value
    min_size=1, max_size=8)


@pytest.mark.sweep
@pytest.mark.parametrize("store_kind", ["plain", "bucketed"])
@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(ops_strategy, min_size=1, max_size=3))
def test_incremental_equals_full_recompute(spark, tmp_path_factory,
                                           store_kind, batches):
    """THE invariant of incremental view maintenance (reference
    processor.py): applying any sequence of CDC batches must leave exactly
    the state a from-scratch recompute of the final sources produces —
    for both the full-rewrite store and the dirty-bucket-commit store."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import Catalog
    from qvarn_mr_spark.operators import (
        BucketedParquetStateStore, IncrementalEngine, ParquetStateStore,
        ViewEngine, map_item, reduce_agg,
    )
    from qvarn_mr_spark.operators.incremental import notifications

    cat = Catalog(spark)
    live: dict[int, tuple[int, int]] = {}

    def sync_table():
        rows = [(str(i), "source", "r", k, v) for i, (k, v) in live.items()]
        cat.register("source", spark.createDataFrame(
            rows, "id string, type string, revision string, key long, value long"))

    eng = ViewEngine(cat, {
        "m": {"source": map_item("key", "value")},
        "v": {"m": reduce_agg(F.sum)},
    })
    root = str(tmp_path_factory.mktemp("ivm_prop"))
    store = (BucketedParquetStateStore(spark, root, buckets=4)
             if store_kind == "bucketed" else ParquetStateStore(spark, root))
    inc = IncrementalEngine(eng, store)

    for batch in batches:
        notes = []
        for op, rid, k, val in batch:
            if op == "upsert":
                change = "updated" if rid in live else "created"
                live[rid] = (k, val)
                notes.append(("source", change, str(rid)))
            elif rid in live:
                del live[rid]
                notes.append(("source", "deleted", str(rid)))
        sync_table()
        if notes:
            inc.apply_changes(notifications(spark, notes))

    if store.exists("v"):
        got = {r["_mr_key"]: r["_mr_value"] for r in inc.read("v").collect()}
    else:
        got = {}   # no notification was ever applied → no state, rightly
    want: dict[str, int] = {}
    for k, v in live.values():
        want[str(k)] = want.get(str(k), 0) + v
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.data())
def test_asof_bucketed_equals_plain(mk_df, data):
    """asof_join_bucketed ≡ asof_join for ANY bucket width, data layout,
    direction and exactness — including widths that put everything in one
    bucket or every row in its own."""
    from qvarn_mr_spark.operators.asof import asof_join, asof_join_bucketed

    keys = st.integers(0, 2)
    ts = st.integers(0, 40)
    left = data.draw(st.lists(st.tuples(keys, ts), min_size=1, max_size=25))
    right = data.draw(st.lists(st.tuples(keys, ts), min_size=0, max_size=25))
    width = data.draw(st.sampled_from([1, 3, 7, 100]))
    direction = data.draw(st.sampled_from(["backward", "forward"]))
    exact = data.draw(st.booleans())

    ldf = mk_df([(k, t, i) for i, (k, t) in enumerate(left)],
                "k long, ts long, lid long")
    rdf = mk_df([(k, t, 1000 + i) for i, (k, t) in enumerate(right)],
                "k long, ts long, rid long")
    kwargs = dict(on=["k"], payload={"rid": "rid"}, direction=direction,
                  allow_exact_matches=exact, tiebreak=["rid"])
    plain = {r["lid"]: r["rid"]
             for r in asof_join(ldf, rdf, **kwargs).collect()}
    buck = {r["lid"]: r["rid"]
            for r in asof_join_bucketed(ldf, rdf, bucket_width=width,
                                        **kwargs).collect()}
    assert plain == buck


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)
                .map("\n".join), min_size=1, max_size=6),
       st.integers(min_value=2, max_value=3))
def test_line_dedup_matches_python_model(mk_df, docs, min_docs):
    from qvarn_mr_spark.functions.quality import line_dedup
    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
           for r in line_dedup(df, min_docs=min_docs).collect()}
    # python model: keys = distinct normalized lines per doc
    per_doc = [set(l.strip().lower() for l in d.split("\n")
                   if len(l.strip().lower()) >= 1) for d in docs]
    from collections import Counter
    freq = Counter(k for s in per_doc for k in s)
    bad = {k for k, n in freq.items() if n >= min_docs}
    for i, d in enumerate(docs):
        lines = d.split("\n")
        kept = [l for l in lines if l.strip().lower() not in bad]
        assert got[i] == ("\n".join(kept), len(lines),
                          len(lines) - len(kept))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.sets(st.text(alphabet="abcdef123", min_size=1, max_size=6),
               min_size=1, max_size=30),
       st.sets(st.text(alphabet="ghijkl456", min_size=1, max_size=6),
               min_size=0, max_size=30))
def test_bloom_never_false_negative_property(mk_df, members, absent):
    from pyspark.sql import functions as F
    from qvarn_mr_spark.functions import sketches as sk
    df = mk_df([(m,) for m in members], "it string")
    packed = sk.bloom_pack(sk.bloom_rollup(df, [], "it"))
    probes = mk_df([(x,) for x in members | absent], "it string")
    hits = {r["it"]: r["hit"] for r in probes.join(F.broadcast(packed))
            .select("it", sk.bloom_might_contain(
                F.col("bloom"), F.col("it")).alias("hit")).collect()}
    assert all(hits[m] for m in members)       # never a false negative


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=6))
def test_bigram_surprisal_matches_python_model(mk_df, docs):
    """bigram_surprisal vs an independent pure-Python interpolated-LM
    implementation on randomized tiny corpora."""
    import math
    from collections import Counter

    from qvarn_mr_spark.functions.text import bigram_surprisal

    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
           for r in bigram_surprisal(df).collect()}

    toks = {i: _tokens(d) for i, d in enumerate(docs)}
    pairs = {i: list(zip(t, t[1:])) for i, t in toks.items()}
    c_uw = Counter(p for ps in pairs.values() for p in ps)
    c_u = Counter(p[0] for ps in pairs.values() for p in ps)
    uni = Counter(w for t in toks.values() for w in t)
    n, v = sum(uni.values()), len(uni)
    lam, s = 0.7, 0.5
    want = {}
    for i, ps in pairs.items():
        if not ps:
            continue
        nll = [-math.log(lam * c_uw[p] / c_u[p[0]]
                         + (1 - lam) * (uni[p[1]] + s) / (n + s * v))
               for p in ps]
        want[i] = (len(ps), round(sum(nll) / len(nll), 6))
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(st.sampled_from("abcd"),
                          st.integers(0, 5)), min_size=1, max_size=20),
       st.integers(1, 4))
def test_cluster_keepers_matches_python_model(mk_df, rows, mod):
    """cluster_keepers vs the pure-Python (score, id) tuple max — ids are
    strings, clusters arbitrary, duplicate scores common (0..5 range)."""
    from qvarn_mr_spark.functions.dedup import cluster_keepers

    data = [(f"id{j}", c, float(s % mod)) for j, (c, s) in enumerate(rows)]
    clusters = mk_df([(i, c) for i, c, _ in data],
                     "node string, cluster_id string")
    scores = mk_df([(i, s) for i, _, s in data],
                   "node string, quality double")
    got = {r["cluster_id"]: (r["keeper_id"], r["best_score"], r["n_members"])
           for r in cluster_keepers(clusters, scores).collect()}
    want = {}
    for i, c, s in data:
        cur = want.get(c)
        if cur is None or (s, i) > (cur[0], cur[1]):
            want[c] = (s, i)
    counts = {}
    for _, c, _ in data:
        counts[c] = counts.get(c, 0) + 1
    assert set(got) == set(want)
    for c, (s, i) in want.items():
        assert got[c] == (i, round(s, 6), counts[c])


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.sets(st.text(alphabet="abc123", min_size=1, max_size=5),
               min_size=1, max_size=25),
       st.integers(0, 3), st.integers(1, 5))
def test_epoch_shuffle_is_permutation(mk_df, ids, epoch, n_shards):
    """epoch_shuffle must be a bijection onto dense per-shard positions,
    shards in range, deterministic across invocations."""
    from qvarn_mr_spark.functions.sampling import epoch_shuffle

    df = mk_df([(i,) for i in sorted(ids)], "doc_id string")
    out = epoch_shuffle(df, "doc_id", epoch=epoch, n_shards=n_shards)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == ids        # bijection on rows
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in epoch_shuffle(df, "doc_id", epoch=epoch,
                                    n_shards=n_shards).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 40), min_size=1, max_size=15),
       st.integers(2, 12), st.integers(8, 64))
def test_length_batches_matches_python_model(mk_df, lens, batch_tokens,
                                             bucket_width):
    """length_batches vs the pure-Python bucket + running-sum floor rule."""
    from qvarn_mr_spark.functions.sampling import length_batches

    rows = [(i, " ".join(["w"] * ln)) for i, ln in enumerate(lens)]
    df = mk_df(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"], r["batch_id"])
           for r in length_batches(df, batch_tokens=batch_tokens,
                                   bucket_width=bucket_width).collect()}
    buckets = {}
    for i, ln in enumerate(lens):
        if ln > 0:
            buckets.setdefault(ln // bucket_width, []).append((i, ln))
    want = {}
    for b, members in buckets.items():
        cum = 0
        for i, ln in sorted(members):
            want[i] = (ln, b, cum // batch_tokens)
            cum += ln
    assert got == want


def _minhash_bands_py(text, n_hashes=8, n_bands=4):
    """Independent pure-Python model of the whole MinHash pipeline:
    distinct word-3-shingles -> md5('{seed}|{shingle}') hex slices ->
    min per hash -> '|'-joined bands (mirrors dedup._minhash_cols)."""
    import hashlib

    sh = _shingles(text)
    if not sh:
        return None
    hs = []
    for i in range(n_hashes):
        seed = chr(ord("a") + i // 4)
        hs.append(min(
            hashlib.md5(f"{seed}|{s}".encode()).hexdigest()
            [8 * (i % 4):8 * (i % 4) + 8] for s in sh))
    rows = n_hashes // n_bands
    return ["|".join(hs[b * rows + r] for r in range(rows))
            for b in range(n_bands)]


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=6))
def test_minhash_pipeline_matches_python_model(mk_df, docs):
    """Signatures, per-row band keys, AND candidate pairs all agree with
    the hashlib model — the end-to-end pin of the LSH stack."""
    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    want = {i: _minhash_bands_py(d) for i, d in enumerate(docs)
            if _minhash_bands_py(d) is not None}

    sigs = {r["doc_id"]: [r[f"band_{b}"] for b in range(4)]
            for r in dedup.minhash_signatures(df, "doc_id", "text").collect()}
    assert sigs == want

    keys = {r["doc_id"]: r["k"] for r in df.select(
        "doc_id", dedup.minhash_band_keys_col("text").alias("k")).collect()}
    for i, d in enumerate(docs):
        exp = ([] if i not in want
               else [f"{b}|{s}" for b, s in enumerate(want[i])])
        assert keys[i] == exp

    got_pairs = {(r["a_id"], r["b_id"]): r["n_bands"] for r in
                 dedup.minhash_candidates(df, "doc_id", "text").collect()}
    want_pairs = {}
    ids = sorted(want)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            n = sum(1 for p, q in zip(want[a], want[b]) if p == q)
            if n:
                want_pairs[(a, b)] = n
    assert got_pairs == want_pairs


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=2, max_size=8))
def test_minhash_contamination_boundary_consistency(mk_df, docs):
    """minhash_contamination flags exactly the corpus docs sharing ≥1
    band VALUE (at its position) with any eval doc — checked against the
    hashlib band model on a random corpus/eval split."""
    from qvarn_mr_spark.functions.quality import minhash_contamination

    corpus = [(i, d) for i, d in enumerate(docs) if i % 2 == 0]
    ev = [(i, d) for i, d in enumerate(docs) if i % 2 == 1]
    got = {r["doc_id"]: r["n_shared_bands"] for r in minhash_contamination(
        mk_df(corpus, "doc_id long, text string"),
        mk_df(ev, "doc_id long, text string")).collect()}

    ev_keys = set()
    for _, d in ev:
        bands = _minhash_bands_py(d)
        if bands:
            ev_keys.update((b, s) for b, s in enumerate(bands))
    want = {}
    for i, d in corpus:
        bands = _minhash_bands_py(d)
        if not bands:
            continue
        n = sum(1 for b, s in enumerate(bands) if (b, s) in ev_keys)
        if n:
            want[i] = n
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=6))
def test_trigram_surprisal_matches_python_model(mk_df, docs):
    """trigram_surprisal vs an independent pure-Python interpolated-LM
    implementation on randomized tiny corpora."""
    import math
    from collections import Counter

    from qvarn_mr_spark.functions.text import trigram_surprisal

    df = mk_df(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_trigrams"], r["mean_nll"])
           for r in trigram_surprisal(df).collect()}

    toks = {i: _tokens(d) for i, d in enumerate(docs)}
    tris = {i: list(zip(t, t[1:], t[2:])) for i, t in toks.items()}
    bis = [p for t in toks.values() for p in zip(t, t[1:])]
    c_uvw = Counter(g for gs in tris.values() for g in gs)
    c_uv = Counter(g[:2] for gs in tris.values() for g in gs)
    c_vw = Counter(bis)
    c_v = Counter(p[0] for p in bis)
    uni = Counter(w for t in toks.values() for w in t)
    n, v = sum(uni.values()), len(uni)
    l3, l2, s = 0.5, 0.3, 0.5
    l1 = 1.0 - l3 - l2
    want = {}
    for i, gs in tris.items():
        if not gs:
            continue
        nll = [-math.log(l3 * c_uvw[g] / c_uv[g[:2]]
                         + l2 * c_vw[g[1:]] / c_v[g[1]]
                         + l1 * (uni[g[2]] + s) / (n + s * v))
               for g in gs]
        want[i] = (len(gs), round(sum(nll) / len(nll), 6))
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6)
