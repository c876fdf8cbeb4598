"""Unit tests for the function library: text analysis, dedup, similarity,
multimodal plumbing — known tiny inputs, exact expected outputs."""

import math

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog is in the house"),          # en
        (1, "der Hund und die Katze ist nicht ein Tier"),     # de
        (2, "le chat est une bete que la maison pour"),       # fr
        (3, "xyzzy plugh"),                                   # und
        (4, ""),                                              # empty
        (5, "The cat AND the dog -- is in the house!!"),      # near-dup of 0
        (6, "the cat and the dog is in the house"),           # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def rows_by_id(df, *cols):
    return {r["doc_id"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_token_and_char_count(docs):
    out = docs.select("doc_id", text.token_count("text").alias("t"),
                      text.char_count("text").alias("c"))
    got = rows_by_id(out, "t", "c")
    assert got[0] == (9, 35)
    assert got[3] == (2, 11)
    assert got[4] == (0, 0)


def test_lang_guess(docs):
    got = rows_by_id(docs.select("doc_id", text.lang_guess("text").alias("l")), "l")
    assert got[0] == ("en",)
    assert got[1] == ("de",)
    assert got[2] == ("fr",)
    assert got[3] == ("und",)
    assert got[4] == ("und",)


def test_fingerprint_normalizes(docs):
    got = rows_by_id(docs.select("doc_id", text.fingerprint("text").alias("f")), "f")
    assert got[0] == got[5] == got[6]      # case/punct-insensitive
    assert got[0] != got[1]


def test_punct_and_stopword_ratio(docs):
    out = docs.select("doc_id", text.punct_ratio("text").alias("p"),
                      text.stopword_ratio("text").alias("s"))
    got = rows_by_id(out, "p", "s")
    assert got[4] == (0.0, 0.0)
    assert got[0][0] == 0.0
    p5 = got[5][0]
    assert p5 == pytest.approx(4 / 40)     # two '-' + two '!' in 40 chars
    assert got[0][1] == pytest.approx(6 / 9)  # 3×the + and + is + in / 9 tokens


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "doc_id", "text")
    groups = {r["fp"]: (r["n_dups"], r["keeper_id"]) for r in out.collect()}
    assert (3, 0) in groups.values()       # docs 0, 5, 6 collapse; keeper 0


def test_shingles():
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")],
                               "doc_id long, text string")
    sh = dedup.shingle_table(df, "doc_id", "text")
    got = {(r["doc_id"], r["shingle"]) for r in sh.collect()}
    assert got == {(1, "a b c"), (1, "b c d")}   # doc 2 is shorter than k=3


def test_ngram_jaccard_finds_near_dup(docs):
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", "text")
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 5)] == 1.0            # identical after normalization
    assert pairs[(0, 6)] == 1.0
    assert (0, 1) not in pairs


def test_ngram_jaccard_max_df_cutoff(spark):
    """Frequency cutoff: a boilerplate shingle present in EVERY doc (think
    a shared header) pairs all n docs quadratically; max_df drops it before
    the self-join, and jaccard is consistently over the filtered sets."""
    boiler = "common header line"             # one shingle, in all docs
    rows = [(i, f"{boiler} unique{i} text{i} only{i} here{i}")
            for i in range(30)]
    # two real near-dups sharing their non-boilerplate shingles
    rows += [(100, f"{boiler} same body here now"),
             (101, f"{boiler} same body here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = dedup.ngram_jaccard_pairs(df, "doc_id", "text", min_common=1)
    cut = dedup.ngram_jaccard_pairs(df, "doc_id", "text", min_common=1,
                                    max_df=5)
    n_full, n_cut = full.count(), cut.count()
    assert n_full >= 32 * 31 // 2          # boilerplate pairs everything
    assert n_cut == 1                      # only the real near-dup survives
    got = cut.collect()[0]
    assert (got["a_id"], got["b_id"]) == (100, 101)
    # jaccard over FILTERED sets: both docs keep exactly their 4 distinct
    # non-boilerplate-reachable shingles and share all of them ⇒ 1.0
    assert got["jaccard"] == 1.0


def test_minhash_lsh_finds_near_dup(docs):
    cands = dedup.minhash_candidates(docs, "doc_id", "text")
    got = {(r["a_id"], r["b_id"]): r["n_bands"] for r in cands.collect()}
    # identical shingle sets agree on every band
    assert got[(0, 5)] == dedup.MINHASH_BANDS
    assert got[(0, 6)] == dedup.MINHASH_BANDS


def test_minhash_degenerate_bucket_streams(spark):
    """A 1,000-doc near-identical template cluster (the adversarial 100 TB
    shape: survives exact dedup, collapses onto shared LSH buckets) must
    complete with every output row a fixed-width (a_id, b_id, n_bands)
    triple — the pair expansion is a distributed equi-join, never an
    in-row m² struct blowup. The plan must not contain collect_list."""
    n = 1000
    rows = [(i, "the quick brown fox jumps over the lazy dog "
                "and then sits down to rest") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = dedup.minhash_candidates(df, "doc_id", "text")
    plan = cands._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    # identical texts → every doc lands in the same bucket in every band:
    # the full n(n-1)/2 pair set must stream through and aggregate exactly
    agg = cands.agg(F.count(F.lit(1)).alias("n"),
                    F.min("n_bands").alias("lo"),
                    F.max("n_bands").alias("hi")).collect()[0]
    assert agg["n"] == n * (n - 1) // 2
    assert agg["lo"] == agg["hi"] == dedup.MINHASH_BANDS
    # the explicit skew valve: capping bucket size drops the degenerate
    # buckets whole — zero pairs from a cluster whose every bucket > cap
    capped = dedup.minhash_candidates(df, "doc_id", "text", max_bucket=50)
    assert capped.count() == 0


def test_simhash_near_dup_close(docs):
    got = rows_by_id(dedup.simhash(docs, "doc_id", "text"), "simhash")
    h0, h5, h1 = got[0][0], got[5][0], got[1][0]
    assert h0 == h5                        # same token set → same signature
    assert 0 <= h0 < 2 ** dedup.SIMHASH_BITS
    assert bin(h0 ^ h1).count("1") > 0     # different docs differ


def test_simhash_candidates_exact_vs_bruteforce(docs):
    """Banded-bits LSH must be EXACT for hamming ≤ SIMHASH_BANDS-1: the
    candidate set equals brute-force all-pairs bit_count(xor) ≤ 3."""
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(docs, "doc_id", "text").collect()}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                want.add((a, b, ham))
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in dedup.simhash_candidates(docs, "doc_id", "text").collect()}
    assert got == want
    assert want                              # fixture actually has near-dups


def test_knn_bruteforce(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.knn_bruteforce(df, "vec_id", "embedding",
                                    F.col("vec_id") == 0, k=3)
    ranked = [r["n_id"] for r in out.orderBy("rn").collect()]
    assert ranked == [1, 2, 3]
    top = out.filter(F.col("rn") == 1).collect()[0]
    assert top["cos_sim"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)


def test_ivf_assign(spark):
    vecs = [(0, [1.0, 0.0]), (100, [0.0, 1.0]),
            (7, [0.9, 0.2]), (8, [0.1, 0.8])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.ivf_assign(df, "vec_id", "embedding",
                                F.col("vec_id") % 100 == 0)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {0: 0, 100: 100, 7: 0, 8: 100}


def test_nearest_neighbor_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """With nprobe = nlist every cluster is probed, so the IVF candidate set
    covers the corpus and the result must equal exact brute force."""
    from qvarn_mr_spark.catalog import load_tables
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cent = F.col("vec_id") % 10 == 0
    nlist = emb.filter(cent).count()
    exact = {(r["q_id"], r["n_id"], r["cos_sim"])
             for r in similarity.nearest_neighbor(
                 emb, "vec_id", "embedding").collect()}
    full = {(r["q_id"], r["n_id"], r["cos_sim"])
            for r in similarity.nearest_neighbor_ivf(
                emb, "vec_id", "embedding", cent, nprobe=nlist).collect()}
    assert full == exact


def test_nearest_neighbor_ivf_recall_monotone(spark, sf_dir):
    """recall@1 vs brute force must not decrease as nprobe grows, and every
    IVF answer is a real (not fabricated) pair with the true similarity."""
    from qvarn_mr_spark.catalog import load_tables
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cent = F.col("vec_id") % 10 == 0
    exact = {r["q_id"]: r["n_id"] for r in similarity.nearest_neighbor(
        emb, "vec_id", "embedding").collect()}

    def recall(nprobe):
        got = {r["q_id"]: r["n_id"] for r in similarity.nearest_neighbor_ivf(
            emb, "vec_id", "embedding", cent, nprobe=nprobe).collect()}
        assert set(got) <= set(exact)          # no fabricated query ids
        return sum(got.get(q) == exact[q] for q in exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert 0 < r1 <= r2 <= 1


def test_centroid_by_label(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (1, [3.0, 5.0]), (2, [2.0, 2.0])],
        "label int, embedding array<float>")
    out = similarity.centroid_by_label(df, "label", "embedding")
    got = {(r["label"], r["pos"]): r["avg_val"] for r in out.collect()}
    assert got == {(1, 0): 2.0, (1, 1): 4.0, (2, 0): 2.0, (2, 1): 2.0}


# -- multimodal plumbing -----------------------------------------------------

def test_media_features_deterministic(spark):
    media = multimodal.synthetic_media(spark, n=12)
    out = multimodal.extract_features(media, decoder=multimodal.fake_decode)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        norm = sum(v * v for v in r["feature"]) ** 0.5
        assert norm == pytest.approx(1.0)
    # deterministic: same input → same features
    again = {r["media_id"]: r["feature"]
             for r in multimodal.extract_features(
                 media, decoder=multimodal.fake_decode).collect()}
    assert again[rows[0]["media_id"]] == rows[0]["feature"]


def test_media_decode_stub_raises(spark):
    media = multimodal.synthetic_media(spark, n=2)
    with pytest.raises(Exception):   # NotImplementedError inside executor
        multimodal.extract_features(media).collect()


def test_stdlib_decode_wav_and_ppm_locally():
    """Pure-Python check: stdlib_decode really parses the container formats
    — WAV yields the exact PCM frame bytes written, PPM the exact raster."""
    wav = multimodal.synthetic_wav_bytes(n_samples=100, seed=3)
    pcm = multimodal.stdlib_decode(wav, {"format": "wav"})
    assert len(pcm) == 100 * 2           # 100 mono 16-bit samples
    import io as _io
    import wave as _wave
    with _wave.open(_io.BytesIO(wav), "rb") as w:
        assert pcm == w.readframes(w.getnframes())

    ppm = multimodal.synthetic_ppm_bytes(5, 4, seed=7)
    raster = multimodal.stdlib_decode(ppm, {"format": "ppm"})
    assert len(raster) == 5 * 4 * 3
    assert ppm.endswith(raster)          # raster is the file tail
    with pytest.raises(NotImplementedError):
        multimodal.stdlib_decode(b"\x89PNG....", {"format": "png"})


def test_stdlib_decode_end_to_end(spark):
    """Real media bytes (WAV audio + PPM images) decoded by the stdlib codec
    inside extract_features' mapInPandas — the non-stubbed decode path."""
    media = multimodal.synthetic_media_real(spark, n=10)
    out = multimodal.extract_features(media, decoder=multimodal.stdlib_decode)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        norm = sum(v * v for v in r["feature"]) ** 0.5
        assert norm == pytest.approx(1.0)
    # feature really derives from the decoded buffer, not the container
    # bytes: recompute one row's expected vector driver-side
    import hashlib as _hashlib
    raw = media.filter("media_id = 1").collect()[0]
    decoded = multimodal.stdlib_decode(bytes(raw["payload"]),
                                       raw["meta"].asDict())
    h = _hashlib.sha256(decoded).digest()
    vec = [h[i] / 255.0 for i in range(multimodal.FEATURE_DIM)]
    nrm = sum(v * v for v in vec) ** 0.5
    expect = [v / nrm for v in vec]
    got = {r["media_id"]: r["feature"] for r in rows}[1]
    assert got == pytest.approx(expect)


def test_frame_sample_shapes(spark):
    media = multimodal.synthetic_media(spark, n=9)
    frames = multimodal.frame_sample(media, every_ms=500)
    rows = frames.collect()
    assert rows, "videos must produce frames"
    videos = {r["meta"]["duration_ms"]: r["media_id"]
              for r in media.filter("meta.kind = 'video'").collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    for dur, mid in videos.items():
        assert len(by_media[mid]) == math.ceil(dur / 500)
    assert all(len(r["frame"]) == 16 for r in rows)


# -- approximate aggregates (SURVEY §2.4 A10 extension) ----------------------

def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """approx_count_distinct (HLL) and approx_percentile bound error vs the
    exact forms — the constant-memory path for 100 TB cardinalities where
    exact distinct counting would shuffle every value."""
    from qvarn_mr_spark.catalog import load_tables
    li = load_tables(spark, sf_dir, tables=("lineitem",))["lineitem"]
    row = li.agg(
        F.countDistinct("l_suppkey").alias("exact_d"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("ap50"),
    ).collect()[0]
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.1
    assert abs(row["ap50"] - row["exact_p50"]) / row["exact_p50"] < 0.05


def test_dup_clusters_equals_union_find(spark):
    """dup_clusters (distributed pointer-doubling CC) must produce exactly
    the components a sequential union-find yields on the same edges."""
    import random

    from qvarn_mr_spark.functions.dedup import dup_clusters

    rng = random.Random(13)
    edges = {(rng.randrange(60), rng.randrange(60)) for _ in range(50)}
    edges = [(u, v) for u, v in edges if u != v]
    # include a long path to exercise multi-round convergence
    edges += [(100 + i, 101 + i) for i in range(12)]
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    got = {r["node"]: r["cluster_id"]
           for r in dup_clusters(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {x: find(x) for x in parent}
    assert got == want


def test_hyperplane_identical_vectors_always_found(spark):
    """Identical vectors share every sign bit, hence every band — LSH
    recall is exactly 1 for true duplicates, at any threshold."""
    import hashlib
    def vec(seed):
        out = []
        for d in range(64):
            h = hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
            out.append(int(h[:8], 16) / 0xFFFFFFFF - 0.5)
        return out
    rows = []
    for i in range(20):
        v = vec(i)
        rows.append((i, v))
        rows.append((1000 + i, v))          # exact duplicate partner
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.hyperplane_near_dup(df, "vec_id", "embedding",
                                         threshold=0.99)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert {(i, 1000 + i) for i in range(20)} <= pairs


def test_hyperplane_precision_exact_vs_bruteforce(spark, sf_dir):
    """Every emitted pair must be a REAL pair at the true similarity
    (precision 1 — the verify step is exact); emitted pairs are a subset
    of the brute-force thresholded pairs (recall <= 1, the LSH trade)."""
    from qvarn_mr_spark.catalog import load_tables
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    got = {(r["a_id"], r["b_id"]): r["cos_sim"]
           for r in similarity.hyperplane_near_dup(
               emb, "vec_id", "embedding", threshold=0.4).collect()}
    assert got                                  # non-degenerate at 0.4
    v = emb.select(F.col("vec_id").alias("a_id"),
                   F.col("embedding").cast("array<double>").alias("a_vec"))
    w = emb.select(F.col("vec_id").alias("b_id"),
                   F.col("embedding").cast("array<double>").alias("b_vec"))
    brute = {(r["a_id"], r["b_id"]): r["cos_sim"] for r in
             v.join(w, F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id",
                     F.round(similarity.cosine(F.col("a_vec"),
                                               F.col("b_vec")), 6)
                     .alias("cos_sim"))
             .filter(F.col("cos_sim") >= 0.4).collect()}
    for pair, sim in got.items():
        assert pair in brute and brute[pair] == sim
    assert set(got) <= set(brute)


def test_tfidf_top_terms_ranks_rare_terms_higher(spark):
    docs = [(1, "apple banana apple"),       # apple tf=2 but appears in 2 docs
            (2, "apple cherry"),             # cherry unique to doc 2
            (3, "durian durian durian")]     # durian unique, tf=3
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = text.tfidf_top_terms(df, "doc_id", "text", k=2)
    top = {r["doc_id"]: r["term"] for r in out.filter(F.col("rn") == 1).collect()}
    # rare terms beat common ones: cherry (df=1) outranks apple (df=2) in
    # doc 2; durian dominates doc 3; apple tf=2 wins doc 1 over banana only
    # if banana (df=1, tf=1) scores lower — ln(4/2)+1 = 1.69 * 2 = 3.39 vs
    # ln(4/2)... banana: (ln(4/2)+1)*1 = 1.69; apple: (ln(4/3)+1)*2 = 2.58
    assert top == {1: "apple", 2: "cherry", 3: "durian"}
    assert out.filter(F.col("rn") > 2).count() == 0


def test_knn_arrow_equals_jvm_bruteforce(spark, sf_dir):
    """The Arrow/BLAS path must reproduce the JVM fold exactly — same
    pairs, same rounded similarities, same ranks (round-before-rank makes
    partitioning invisible)."""
    from qvarn_mr_spark.catalog import load_tables
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    flt = F.col("vec_id") < 8
    jvm = {(r["q_id"], r["n_id"], r["cos_sim"], r["rn"])
           for r in similarity.knn_bruteforce(
               emb, "vec_id", "embedding", flt, k=3).collect()}
    arrow = {(r["q_id"], r["n_id"], r["cos_sim"], r["rn"])
             for r in similarity.knn_bruteforce_arrow(
                 emb, "vec_id", "embedding", flt, k=3).collect()}
    assert arrow == jvm


def test_dedup_corpus_end_to_end(spark):
    """The composed pipeline: exact dups collapse, near-dups cluster,
    canonical = smallest id, unique docs survive as their own canonical."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    near = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest today")   # 1-word edit
    docs = [
        (1, base), (2, base),            # exact duplicates
        (3, near),                       # near-dup of 1/2
        (4, "completely different text about spark query engines and "
            "distributed columnar shuffles at large scale"),
        (5, "Short unique doc."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
           for r in dedup.dedup_corpus(df, jaccard_threshold=0.5).collect()}
    assert len(out) == 5                      # one row per input doc
    assert out[1] == (1, True)
    assert out[2] == (1, False)               # exact dup of 1
    assert out[3] == (1, False)               # near dup clusters to min id
    assert out[4] == (4, True)
    assert out[5] == (5, True)


def test_knn_arrow_empty_query_set(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.knn_bruteforce_arrow(df, "vec_id", "embedding",
                                          F.col("vec_id") > 100, k=3)
    assert out.count() == 0


def test_minhash_parameterized_layout(docs):
    """Production-scale signature layouts are constructor parameters; the
    toy 8/4 default stays the oracle-checked layout. 32 hashes / 8 bands:
    identical docs still agree on every band."""
    cands = dedup.minhash_candidates(docs, "doc_id", "text",
                                     n_hashes=32, n_bands=8)
    got = {(r["a_id"], r["b_id"]): r["n_bands"] for r in cands.collect()}
    assert got[(0, 5)] == 8
    assert got[(0, 6)] == 8
    with pytest.raises(ValueError):
        dedup.minhash_signatures(docs, "doc_id", "text",
                                 n_hashes=10, n_bands=4)


def test_minhash_production_params_volume_bounded(spark, sf_dir):
    """128 hashes / 32 bands (r=4, threshold ~0.42) on the real documents
    table: candidate volume stays far under the all-pairs n(n-1)/2 — the
    LSH prune holds with production parameters, not just the toy layout."""
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs_tbl.count()
    m = dedup.minhash_candidates(docs_tbl, "doc_id", "text",
                                 n_hashes=128, n_bands=32).count()
    assert m < n * 10                      # linear-ish, nowhere near n²/2
    # and wider signatures don't lose the true duplicate pairs the default
    # layout finds at high agreement (all 4 of 4 bands = certain dup)
    sure = dedup.minhash_candidates(docs_tbl, "doc_id", "text") \
        .filter(F.col("n_bands") == dedup.MINHASH_BANDS) \
        .select("a_id", "b_id")
    wide = dedup.minhash_candidates(docs_tbl, "doc_id", "text",
                                    n_hashes=128, n_bands=32) \
        .select("a_id", "b_id")
    assert sure.join(wide, ["a_id", "b_id"], "left_anti").isEmpty()


def test_simhash_64bit_exact_banding(docs):
    """bits=64 exercises the sign bit (shift/or assembly) and the
    shiftrightunsigned band split: banded candidates must still equal
    brute-force hamming ≤ n_bands-1."""
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(docs, "doc_id", "text", bits=64).collect()}
    assert sigs[0] == sigs[6]              # same token set → same signature
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((sigs[a] ^ sigs[b]) & (2 ** 64 - 1)).count("1")
            if ham <= 7:
                want.add((a, b, ham))
    got = {(r["a_id"], r["b_id"], r["hamming"])
           for r in dedup.simhash_candidates(docs, "doc_id", "text",
                                             max_hamming=7, bits=64,
                                             n_bands=8).collect()}
    assert got == want
    with pytest.raises(ValueError):
        dedup.simhash(docs, "doc_id", "text", bits=13)
    with pytest.raises(ValueError):        # banding not exact for that reach
        dedup.simhash_candidates(docs, "doc_id", "text", max_hamming=4)


def test_semantic_dedup_drops_dominated_keeps_lowest(spark):
    from qvarn_mr_spark.functions import similarity
    # two clear clusters around orthogonal axes; ids 0 and 3 are the
    # centroid set (filter: vec_id % 3 == 0)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid A
        (1, [0.99, 0.1, 0.0, 0.0]),  # near A -> dominated by 0
        (2, [0.98, 0.15, 0.0, 0.0]), # near A -> dominated
        (3, [0.0, 1.0, 0.0, 0.0]),   # centroid B
        (4, [0.0, 0.97, 0.2, 0.0]),  # near B -> dominated by 3
        (5, [0.0, 0.0, 1.0, 0.0]),   # orthogonal to everything in B? ->
                                     # assigned somewhere, no near nbr
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    got = similarity.semantic_dedup(
        df, "vec_id", "embedding",
        centroid_filter=F.col("vec_id") % 3 == 0, threshold=0.9)
    kept = sorted(r["vec_id"] for r in got.collect())
    # lowest id per near-dup group survives; 5 has no 0.9-neighbor
    assert kept == [0, 3, 5]


def test_semantic_dedup_no_threshold_pairs_keeps_all(spark):
    from qvarn_mr_spark.functions import similarity
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7])],
        "vec_id long, embedding array<double>")
    got = similarity.semantic_dedup(
        df, "vec_id", "embedding",
        centroid_filter=F.col("vec_id") < 2, threshold=0.999)
    assert got.count() == 3


def test_pq_train_deterministic_and_shapes(spark, sf_dir):
    import numpy as np
    from qvarn_mr_spark.functions import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = similarity.pq_train(emb, "vec_id", "embedding", m=8, k=8,
                             sample=256, iters=4)
    b2 = similarity.pq_train(emb, "vec_id", "embedding", m=8, k=8,
                             sample=256, iters=4)
    assert b1.shape == (8, 8, 8)
    assert np.array_equal(b1, b2)


def test_pq_search_finds_planted_duplicate_first(spark):
    from qvarn_mr_spark.functions import similarity
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16).astype(float)
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows.append((100, base[5].tolist()))   # exact duplicate of id 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train(df, "vec_id", "embedding", m=4, k=8,
                                iters=5)
    got = similarity.pq_search(df, "vec_id", "embedding",
                               F.col("vec_id") == 100, books, k=1)
    top = got.collect()
    assert len(top) == 1
    # identical vector -> identical codes -> the duplicate's ADC distance
    # is the query's own quantization residual, the smallest possible, so
    # it ranks first (ADC is asymmetric: exact query vs quantized corpus,
    # hence > 0 even for an exact duplicate)
    assert top[0]["n_id"] == 5 and top[0]["adc_dist"] >= 0.0


def test_pq_recall_against_exact_topk(spark, sf_dir):
    from qvarn_mr_spark.functions import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qf = F.col("vec_id") < 8
    exact: dict = {}
    for r in similarity.knn_bruteforce_arrow(
            emb, "vec_id", "embedding", qf, k=10).collect():
        exact.setdefault(r["q_id"], set()).add(r["n_id"])
    books = similarity.pq_train(emb, "vec_id", "embedding", m=32, k=16)
    approx: dict = {}
    for r in similarity.pq_search(emb, "vec_id", "embedding", qf,
                                  books, k=10).collect():
        approx.setdefault(r["q_id"], set()).add(r["n_id"])
    rec = sum(len(exact[q] & approx.get(q, set())) / len(exact[q])
              for q in exact) / len(exact)
    # measured 0.575 at this layout on the structureless synthetic
    # vectors (PQ's worst case); generous floor so the pin never flakes
    assert rec >= 0.35


def test_pq_encode_precomputed_codes_reused(spark):
    from qvarn_mr_spark.functions import similarity
    import numpy as np
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train(df, "vec_id", "embedding", m=4, k=8)
    codes = similarity.pq_encode(df, "vec_id", "embedding", books)
    direct = similarity.pq_search(df, "vec_id", "embedding",
                                  F.col("vec_id") < 3, books, k=5)
    reused = similarity.pq_search(df, "vec_id", "embedding",
                                  F.col("vec_id") < 3, books, k=5,
                                  codes=codes)
    assert sorted(map(tuple, direct.collect())) == \
        sorted(map(tuple, reused.collect()))


def _ref_bpe(word_counts, n_merges, min_pair_count=2):
    """Pure-Python Sennrich BPE over word counts (ties: lexicographic)."""
    words = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] = \
                    pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_count:
            break
        out.append((rank, l, r, l + r, c))
        nxt = {}
        for sym, cnt in words.items():
            merged, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r):
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            nxt[tuple(merged)] = nxt.get(tuple(merged), 0) + cnt
        words = nxt
    return out


def test_bpe_merges_match_reference(spark):
    from collections import Counter
    from qvarn_mr_spark.functions import text as T
    from qvarn_mr_spark.functions.dedup import TOKEN_RE
    import re
    docs = [
        (0, "lower lower lowest low low low"),
        (1, "newer newest new new lowly"),
        (2, "the lower the better lower is newer"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in T.bpe_merges(df, n_merges=6).orderBy("rank").collect()]
    wc = Counter(w for _, t in docs
                 for w in re.split(TOKEN_RE, t.lower()) if w)
    assert got == _ref_bpe(wc, 6)
    assert len(got) == 6 and got[0][0] == 1


def test_bpe_vocab_conserves_char_mass(spark):
    from qvarn_mr_spark.functions import text as T
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(0, "aaab aaab aaac bbbc")], "doc_id long, text string")
    vocab = T.bpe_vocab(df, n_merges=3, min_pair_count=1)
    rows = {r["symbol"]: r["freq"] for r in vocab.collect()}
    # total characters across the corpus are conserved through merges
    total_chars = sum(len(s) * f for s, f in rows.items())
    assert total_chars == 16
    # the dominant pair 'aa' must have been merged into a longer symbol
    assert any(len(s) > 1 for s in rows)


def test_bpe_merges_stop_below_min_count(spark):
    from qvarn_mr_spark.functions import text as T
    df = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    got = T.bpe_merges(df, n_merges=10, min_pair_count=2).collect()
    assert got == []   # every pair occurs once -> no merge reaches 2


def test_image_resize_real_ppm_roundtrip(spark):
    import numpy as np
    out = multimodal.image_resize(
        multimodal.synthetic_media_real(spark, n=6), 4, 3)
    rows = {r["media_id"]: r for r in out.collect()}
    for i in (0, 2, 4):                         # even ids are images
        payload = bytes(rows[i]["payload"])
        meta = rows[i]["meta"]
        assert (meta["width"], meta["height"]) == (4, 3)
        raster = multimodal.stdlib_decode(payload, meta.asDict())
        assert len(raster) == 4 * 3 * 3         # P6, exact raster size
        # exact nearest-neighbor reference on the original bytes
        src = multimodal.synthetic_ppm_bytes(8 + i % 8, 6 + i % 6, seed=i)
        w, h = 8 + i % 8, 6 + i % 6
        arr = np.frombuffer(multimodal.stdlib_decode(src, {"format": "ppm"}),
                            dtype=np.uint8).reshape(h, w, 3)
        yi = (np.arange(3) * h) // 3
        xi = (np.arange(4) * w) // 4
        assert raster == arr[yi][:, xi].tobytes()
    # audio rows pass through untouched
    assert bytes(rows[1]["payload"]) == multimodal.synthetic_wav_bytes(
        n_samples=400 + 8, seed=1)


def test_media_signal_features_real_values(spark):
    import numpy as np
    import struct as st
    out = multimodal.media_signal_features(
        multimodal.synthetic_media_real(spark, n=4))
    rows = {r["media_id"]: r["feature"] for r in out.collect()}
    # audio row 1: recompute RMS from the actual PCM bytes
    wav = multimodal.synthetic_wav_bytes(n_samples=408, seed=1)
    pcm = multimodal.stdlib_decode(wav, {"format": "wav"})
    x = np.frombuffer(pcm, dtype="<i2").astype(float) / 32768.0
    assert rows[1][0] == 0.0                     # audio tag
    assert rows[1][1] == pytest.approx(float(np.sqrt(np.mean(x * x))),
                                       abs=1e-9)
    # image row 0: channel means from the actual raster
    ppm = multimodal.synthetic_ppm_bytes(8, 6, seed=0)
    arr = np.frombuffer(multimodal.stdlib_decode(ppm, {"format": "ppm"}),
                        dtype=np.uint8).reshape(6, 8, 3) / 255.0
    assert rows[0][0] == 1.0                     # image tag
    for ch in range(3):
        assert rows[0][1 + ch] == pytest.approx(
            float(arr[:, :, ch].mean()), abs=1e-9)
    assert rows[0][5] == pytest.approx(8 / 6, abs=1e-9)  # aspect
    assert rows[0][6] == 3.0                     # channel count


def test_substring_dedup_removes_duplicated_spans(spark):
    shared = "alpha beta gamma delta epsilon"       # 5-token span
    rows = [
        (0, f"{shared} unique0a unique0b unique0c"),
        (1, f"intro1 {shared} tail1a tail1b"),
        (2, "totally distinct words here only once ok fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup(df, k=5, min_count=2).collect()}
    # the shared 5-gram is covered in both docs; unique tails survive
    assert got[0]["text"] == "unique0a unique0b unique0c"
    assert got[1]["text"] == "intro1 tail1a tail1b"
    assert got[2]["n_removed"] == 0
    assert got[0]["n_removed"] == 5 and got[1]["n_removed"] == 5


def test_substring_dedup_within_doc_repeat_counts(spark):
    # the same 4-gram twice in ONE doc is a verbatim repeat too
    df = spark.createDataFrame(
        [(0, "p q r s middle p q r s"), (1, "other words entirely here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup(df, k=4, min_count=2).collect()}
    assert got[0]["text"] == "middle"
    assert got[1]["n_removed"] == 0


def test_substring_dedup_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           dedup.substring_dedup(df, k=8).collect()}
    assert got[0]["text"] == "a b" and got[0]["n_removed"] == 0


def test_quantize_roundtrip_preserves_cosine(spark, sf_dir):
    from qvarn_mr_spark.functions.similarity import (cosine, dequantize,
                                                     quantize_embeddings)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = quantize_embeddings(emb)
    joined = emb.join(q, emb["vec_id"] == q["vec_id"]).select(
        cosine(emb["embedding"].cast("array<double>"),
               dequantize(q["qvec"], q["scale"])).alias("c"))
    vals = [r["c"] for r in joined.collect()]
    assert all(v > 0.999 for v in vals)     # int8 keeps cosine ~intact
    # components bounded by int8 range
    mx = q.select(F.array_max(F.transform(
        F.col("qvec"), lambda x: F.abs(x))).alias("m")).collect()
    assert all(r["m"] <= 127 for r in mx)


def test_quantize_zero_vector(spark):
    from qvarn_mr_spark.functions.similarity import quantize_embeddings
    df = spark.createDataFrame([(0, [0.0, 0.0]), (1, [1.0, -2.0])],
                               "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[0]["scale"] == 0.0 and got[0]["qvec"] == [0, 0]
    assert got[1]["qvec"] == [64, -127]     # round(1/2*127)=64


def test_hard_negatives_excludes_same_label(spark):
    vecs = [(0, [1.0, 0.0], 7), (1, [0.99, 0.01], 7),
            (2, [0.9, 0.1], 3), (3, [0.0, 1.0], 3), (4, [-1.0, 0.0], 5)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
    out = similarity.hard_negatives(df, "vec_id", "embedding", "label",
                                    F.col("vec_id") == 0, k=2)
    got = [(r["n_id"], r["rn"]) for r in out.orderBy("rn").collect()]
    # vec 1 (same label 7) must be skipped even though it is the nearest;
    # hardest negative is vec 2, then vec 3
    assert got == [(2, 1), (3, 2)]
    # every (query, negative) pair disagrees on label, for a wider set
    wide = similarity.hard_negatives(df, "vec_id", "embedding", "label",
                                     F.col("vec_id") < 5, k=2)
    labels = {r["vec_id"]: r["label"] for r in df.collect()}
    for r in wide.collect():
        assert labels[r["q_id"]] != labels[r["n_id"]]


def test_bpe_encode_column_equals_arrow_and_reference(spark):
    from qvarn_mr_spark.functions import text as T
    rows = [(0, "low lower lowest low low"),
            (1, "newer newest new"),
            (2, "aaaa aa a"),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = T.bpe_merges(df, n_merges=5, min_pair_count=1)
    pairs = T._merge_pairs(merges)
    assert pairs                         # fixture actually learned merges

    col = {r["doc_id"]: (r["n_words"], r["n_chars"], r["n_subwords"])
           for r in T.bpe_encode(df, merges).collect()}
    arrow = {r["doc_id"]: (r["n_words"], r["n_chars"], r["n_subwords"])
             for r in T.bpe_encode_arrow(df, pairs).collect()}
    assert col == arrow                  # JVM fold == Arrow batch path

    # independent python reference per doc
    import re as _re
    from qvarn_mr_spark.functions.dedup import TOKEN_RE
    for did, text in rows:
        ws = [w for w in _re.split(TOKEN_RE, text.lower()) if w]
        want = (len(ws), sum(len(w) for w in ws),
                sum(len(T.bpe_fold_reference(w, pairs)) for w in ws))
        assert col[did] == want, did

    # merges only ever shrink the subword count, chars are conserved
    for did, (nw, nc, ns) in col.items():
        assert nw <= ns <= nc or (nw, nc, ns) == (0, 0, 0)


def test_expr_let_binds_once_and_preserves_semantics(spark):
    """expr_let must be a pure let-binding: same result as inlining, for
    scalars, arrays, and NULL bounds."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, ""), (3, None)], "id long, text string")
    toks = dedup.tokens_col("text")
    inline = df.select(
        (F.size(toks) + F.size(toks)).alias("x")).collect()
    bound = df.select(
        dedup.expr_let(toks, lambda t: F.size(t) + F.size(t))
        .alias("x")).collect()
    assert [r["x"] for r in inline] == [r["x"] for r in bound]
    # scalar bound + NULL propagation
    got = df.select(dedup.expr_let(
        F.length("text"), lambda n: n * 2).alias("y")).collect()
    assert [r["y"] for r in got] == [7 * 2, 0, None]


def test_cluster_keepers_quality_wins(spark):
    """Keeper = highest-quality member, ties toward the larger id; the
    (score, id) tuple max is the same total order the DuckDB oracle
    uses."""
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2"), ("e", "c2")],
        "node string, cluster_id string")
    scores = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9), ("c", 0.9), ("d", 0.5), ("e", 0.1)],
        "node string, quality double")
    got = {r["cluster_id"]: (r["keeper_id"], r["best_score"], r["n_members"])
           for r in dedup.cluster_keepers(clusters, scores).collect()}
    assert got["c1"] == ("c", 0.9, 3)      # tie 0.9: larger id wins
    assert got["c2"] == ("d", 0.5, 2)


def test_cluster_keepers_null_scores_defined(spark):
    """NULL score reads as -inf: still a member, only wins when the whole
    cluster is unscored (then the larger id, deterministically)."""
    clusters = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("x", "c2"), ("y", "c2")],
        "node string, cluster_id string")
    scores = spark.createDataFrame(
        [("a", None), ("b", 0.4), ("x", None), ("y", None)],
        "node string, quality double")
    got = {r["cluster_id"]: (r["keeper_id"], r["best_score"], r["n_members"])
           for r in dedup.cluster_keepers(clusters, scores).collect()}
    assert got["c1"] == ("b", 0.4, 2)
    assert got["c2"][0] == "y" and got["c2"][2] == 2
    assert got["c2"][1] == float("-inf")


def test_ivf_assign_arrow_matches_jvm(spark):
    """The BLAS twin must equal ivf_assign exactly — including the
    (−cos_sim, cluster_id) tiebreak when two centroids score the same
    rounded similarity (pre-sorted centroid ids + argmax-first-max)."""
    rows = [(10, [1.0, 0.0]), (20, [1.0, 0.0]),      # identical centroids
            (30, [0.0, 1.0]),
            (1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, [0.7, 0.7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") >= 10
    jvm = {(r["vec_id"], r["cluster_id"], r["cos_sim"]) for r in
           similarity.ivf_assign(df, "vec_id", "embedding", flt).collect()}
    arr = {(r["vec_id"], r["cluster_id"], r["cos_sim"]) for r in
           similarity.ivf_assign_arrow(df, "vec_id", "embedding",
                                       flt).collect()}
    assert jvm == arr
    by_id = {v: c for v, c, _ in arr}
    assert by_id[1] == 10          # tie between 10 and 20 -> smaller id
    assert by_id[10] == 10 and by_id[20] == 10


def test_ivf_assign_arrow_empty_centroids(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id long, embedding array<float>")
    out = similarity.ivf_assign_arrow(df, "vec_id", "embedding",
                                      F.col("vec_id") > 100)
    assert out.count() == 0


def test_nearest_neighbor_ivf_arrow_matches_jvm(spark):
    """The fully-Arrow IVF NN (BLAS assignment + cogrouped per-cluster
    matmul verify + min_by global argmax) must equal the JVM form
    exactly — including lone-self clusters (no self-match emitted) and
    smallest-n_id tiebreaks."""
    import math
    rows = []
    for i in range(24):
        ang = (i % 6) / 6.0 * 1.5
        rows.append((i, [math.cos(ang) + 0.01 * i, math.sin(ang), 0.1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") % 8 == 0           # 3 centroids
    jvm = {tuple(r) for r in similarity.nearest_neighbor_ivf(
        df, "vec_id", "embedding", flt, nprobe=2).collect()}
    arr = {tuple(r) for r in similarity.nearest_neighbor_ivf_arrow(
        df, "vec_id", "embedding", flt, nprobe=2).collect()}
    assert jvm == arr and jvm


def test_nearest_neighbor_ivf_hybrid_assign_matches(spark):
    """arrow_assign=True (BLAS assignment, JVM verify) is the third
    form — all three must agree."""
    import math
    rows = [(i, [math.cos(i / 5.0), math.sin(i / 5.0)])
            for i in range(15)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") % 5 == 0
    jvm = {tuple(r) for r in similarity.nearest_neighbor_ivf(
        df, "vec_id", "embedding", flt, nprobe=2).collect()}
    hyb = {tuple(r) for r in similarity.nearest_neighbor_ivf(
        df, "vec_id", "embedding", flt, nprobe=2,
        arrow_assign=True).collect()}
    assert jvm == hyb and jvm


def test_ivf_assign_topn_arrow_matches_jvm(spark):
    """Direct differential for the top-n Arrow assignment (rn order and
    ties), not just transitively through nearest_neighbor_ivf."""
    rows = [(10, [1.0, 0.0]), (20, [1.0, 0.0]), (30, [0.0, 1.0]),
            (1, [0.8, 0.2]), (2, [0.3, 0.7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") >= 10
    jvm = {tuple(r) for r in similarity.ivf_assign_topn(
        df, "vec_id", "embedding", flt, nprobe=2).collect()}
    arr = {tuple(r) for r in similarity.ivf_assign_topn_arrow(
        df, "vec_id", "embedding", flt, nprobe=2).collect()}
    assert jvm == arr and jvm
    # tie between centroids 10 and 20: rn=1 -> 10, rn=2 -> 20
    by_rank = {(v, rn): c for v, c, _, rn in arr}
    assert by_rank[(1, 1)] == 10 and by_rank[(1, 2)] == 20


def test_nearest_neighbor_ivf_arrow_max_cluster_valve(spark):
    """The degenerate-cluster memory contract is enforced in code, not
    just documented: one mega-cluster (every vector nearest the same
    centroid) must trip the max_cluster valve with an actionable error
    BEFORE the per-cluster matmul runs, while a permissive cap lets the
    same input through unchanged."""
    import math
    import pytest
    # 20 near-identical vectors + 1 far-away centroid no one maps to:
    # centroid 0's rn=1 cluster holds all 20 probes.
    rows = [(i, [1.0, 0.001 * i]) for i in range(20)]
    rows += [(100, [1.0, 0.0]), (200, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") >= 100
    with pytest.raises(ValueError, match="max_cluster"):
        similarity.nearest_neighbor_ivf_arrow(
            df, "vec_id", "embedding", flt, nprobe=1, max_cluster=5)
    ok = similarity.nearest_neighbor_ivf_arrow(
        df, "vec_id", "embedding", flt, nprobe=1, max_cluster=50)
    jvm = {tuple(r) for r in similarity.nearest_neighbor_ivf(
        df, "vec_id", "embedding", flt, nprobe=1).collect()}
    assert {tuple(r) for r in ok.collect()} == jvm and jvm


def test_arrow_zero_norm_vectors_deterministic(spark):
    """A zero vector is a contract violation for cosine (0/0), but the
    Arrow twins must stay deterministic instead of argmax-ing over NaN:
    _unit_rows pins its norm to 1, so a zero vector scores 0.0 against
    every centroid and the assignment falls to the ordinary first-max
    (= smallest centroid id) rule."""
    rows = [(10, [1.0, 0.0]), (20, [0.0, 1.0]),
            (1, [0.0, 0.0]),              # zero-norm probe
            (2, [0.6, 0.8])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") >= 10
    out = {r["vec_id"]: (r["cluster_id"], r["cos_sim"]) for r in
           similarity.ivf_assign_arrow(df, "vec_id", "embedding",
                                       flt).collect()}
    assert out[1] == (10, 0.0)            # deterministic, not NaN
    assert out[2] == (20, 0.8)            # normal rows unaffected


def test_nearest_neighbor_ivf_zero_norm_member_loses(spark):
    """JVM-path regression for the min_by rewrite: a zero-norm member
    scores NULL cos_sim (Spark double division by zero → NULL), and NULL
    sorts FIRST in ascending struct comparison — unguarded it would WIN
    the argmax and be returned as 'nearest' with a null score. The old
    window ordered nulls last; the aggregate must drop them."""
    rows = [(10, [1.0, 0.0]),             # sole centroid → one cluster
            (1, [1.0, 0.1]),              # query under test
            (2, [0.0, 0.0]),              # zero-norm member (NULL scores)
            (3, [0.9, 0.05])]             # true nearest of vec 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    flt = F.col("vec_id") >= 10
    out = {r["q_id"]: r for r in similarity.nearest_neighbor_ivf(
        df, "vec_id", "embedding", flt, nprobe=1).collect()}
    assert out[1]["n_id"] == 3 and out[1]["cos_sim"] is not None
    assert all(r["cos_sim"] is not None for r in out.values())
    # the zero-norm QUERY has only NULL scores -> no row, not a null row
    assert 2 not in out


def test_ivf_column_forms_zero_norm_hardening(spark):
    """r13 self-review: the _ivf_score_structs Column family
    (ivf_cluster_col / ivf_route_col — the maintained-IVF engine and
    probe routing) must apply the same zero-norm discipline as the
    batch argmax paths: a zero-norm CENTROID never wins an assignment
    or appears in a route (its undefined score coalesces to +inf and
    loses every ascending comparison, instead of NULL sorting first
    and winning), and a zero-norm ROW assigns to NULL / routes nowhere
    (the Column mirror of the batch paths dropping null-scored rows) —
    with no ANSI divide-by-zero abort anywhere."""
    cents = [(0, [0.0, 0.0]),             # zero-norm centroid
             (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    rows = [(1, [0.9, 0.1]),              # nearest live centroid: 1
            (2, [0.1, 0.9]),              # nearest live centroid: 2
            (3, [0.0, 0.0])]              # zero-norm row
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {r["id"]: r for r in df.select(
        "id",
        similarity.ivf_cluster_col("v", cents).alias("c"),
        similarity.ivf_cluster_col("v", cents, with_sim=True).alias("cs"),
        similarity.ivf_route_col("v", cents, nprobe=3).alias("routes"))
        .collect()}
    assert got[1]["c"] == 1 and got[2]["c"] == 2
    assert got[3]["c"] is None and got[3]["cs"] is None
    assert got[1]["cs"]["cluster_id"] == 1
    assert got[1]["cs"]["cos_sim"] is not None
    # routes: ranked live centroids only — cluster 0 never routes
    assert list(got[1]["routes"]) == [1, 2]
    assert list(got[2]["routes"]) == [2, 1]
    assert list(got[3]["routes"]) == []


# ---------------------------------------------------------------------------
# k-means (Lloyd) + cluster-density sampling
# ---------------------------------------------------------------------------

def _py_kmeans(vecs, init_ids, iters):
    """Driver-free Python model of similarity.kmeans_fit: cosine argmax
    (round 6, lowest cluster_id on ties), mean update (round 6), empty
    clusters carry forward."""
    import numpy as np

    def unit(v):
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    cents = {i: np.round(np.asarray(vecs[i], dtype=np.float64), 6)
             for i in init_ids}
    assign = {}
    for _ in range(iters):
        assign = {}
        for vid, v in vecs.items():
            vn = unit(np.asarray(v, dtype=np.float64))
            best = min(
                ((-round(float(vn @ unit(c)), 6), cid)
                 for cid, c in cents.items()))
            assign[vid] = best[1]
        new = {}
        for cid in cents:
            members = [np.asarray(vecs[v], dtype=np.float64)
                       for v, a in assign.items() if a == cid]
            if members:
                new[cid] = np.round(np.mean(members, axis=0), 6)
            else:
                new[cid] = cents[cid]
        cents = new
    return cents


def test_kmeans_fit_matches_python_model(spark):
    """Randomized differential: the distributed Lloyd loop must equal the
    sequential Python model exactly — centroids AND rounds, not just the
    final assignment."""
    import random

    import numpy as np

    rng = random.Random(77)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(5)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = dict(similarity.kmeans_fit(
        df, "vec_id", "embedding", F.col("vec_id") % 10 == 0, iters=3))
    want = _py_kmeans(vecs, [0, 10, 20, 30], iters=3)
    assert set(got) == set(want)
    for cid in want:
        np.testing.assert_allclose(got[cid], want[cid], atol=2e-6)


def test_kmeans_assign_uses_fitted_centroids(spark):
    """Two separated blobs, seeds both inside blob A: after one Lloyd
    round the second centroid must migrate to blob B, so assignment
    under the FITTED centroids splits the blobs — the raw seed
    assignment (ivf_assign) cannot."""
    blob_a = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(0, 4)]
    blob_b = [(i, [0.0, 1.0 + 0.01 * i]) for i in range(10, 14)]
    # seeds: 0 (blob A) and 10 (blob B) after modulus 10
    df = spark.createDataFrame(blob_a + blob_b,
                               "vec_id long, embedding array<float>")
    out = similarity.kmeans_assign(df, "vec_id", "embedding",
                                   F.col("vec_id") % 10 == 0, iters=2)
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    assert {got[i] for i in range(0, 4)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}


def test_kmeans_empty_cluster_carries_forward(spark):
    """A seed that wins no vectors keeps its previous centroid instead of
    vanishing or going NaN (same rule as the DuckDB twin's left join)."""
    vecs = [(0, [1.0, 0.0]), (1, [0.99, 0.01]), (2, [0.98, 0.02]),
            (10, [-1.0, -1.0])]  # seed 10 loses every cosine argmax to 0
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = dict(similarity.kmeans_fit(
        df, "vec_id", "embedding",
        F.col("vec_id").isin(0, 10), iters=2))
    assert set(cents) == {0, 10}
    # 10 attracted only itself every round -> stays at its own vector
    assert cents[10] == [-1.0, -1.0]
    assert all(v == v for v in cents[0])  # no NaN


def test_cluster_density_sample_caps_dense_cluster(spark):
    """Dense cluster downsamples toward cap, sparse cluster survives
    whole; keep decisions are retry-stable (re-run identical)."""
    dense = [(i, [1.0, 0.001 * i]) for i in range(100)]
    sparse = [(200 + i, [0.0, -1.0 - 0.01 * i]) for i in range(3)]
    df = spark.createDataFrame(dense + sparse,
                               "vec_id long, embedding array<float>")
    init = F.col("vec_id").isin(0, 200)
    out = similarity.cluster_density_sample(
        df, "vec_id", "embedding", init, cap=20, iters=1)
    rows = out.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    # sparse cluster: keep_frac 1.0, all rows survive
    assert len(by_cluster[200]) == 3
    assert all(r["keep_frac"] == 1.0 for r in by_cluster[200])
    # dense cluster: fraction 0.2 — hash sampling keeps roughly cap rows
    kept_dense = len(by_cluster[0])
    assert 5 <= kept_dense <= 40
    assert all(r["keep_frac"] == 0.2 for r in by_cluster[0])
    again = {r["vec_id"] for r in similarity.cluster_density_sample(
        df, "vec_id", "embedding", init, cap=20, iters=1).collect()}
    assert again == {r["vec_id"] for r in rows}


def test_kmeans_probe_search_routes_to_trained_cluster(spark):
    """Both seeds start inside blob A; after training, queries from blob
    B must rank neighbors from blob B only — the untrained (seed-row)
    probe would route every query to a blob-A cluster."""
    blob_a = [(i, [1.0, 0.01 * i]) for i in range(0, 6)]
    blob_b = [(i, [0.01 * (i - 10), 1.0]) for i in range(10, 16)]
    df = spark.createDataFrame(blob_a + blob_b,
                               "vec_id long, embedding array<float>")
    out = similarity.kmeans_probe_search(
        df, "vec_id", "embedding", F.col("vec_id") % 10 == 0,
        F.col("vec_id") == 12, k=3, iters=2)
    rows = out.collect()
    assert {r["n_id"] for r in rows} <= set(range(10, 16))
    assert len(rows) == 3 and [r["rn"] for r in rows] != []


def test_kmeans_arrow_matches_jvm(spark):
    """The BLAS fit+assign path must equal the JVM form exactly —
    centroids and final assignment, including rounding and tiebreaks."""
    import random

    rng = random.Random(123)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    flt = F.col("vec_id") % 15 == 0
    jvm_c = similarity.kmeans_fit(df, "vec_id", "embedding", flt, iters=2)
    arr_c = similarity.kmeans_fit(df, "vec_id", "embedding", flt, iters=2,
                                  arrow=True)
    assert jvm_c == arr_c
    jvm = {tuple(r) for r in similarity.kmeans_assign(
        df, "vec_id", "embedding", flt, iters=2).collect()}
    arr = {tuple(r) for r in similarity.kmeans_assign(
        df, "vec_id", "embedding", flt, iters=2, arrow=True).collect()}
    assert jvm == arr


def test_minhash_linear_family_matches_python_model(docs):
    """The linear hash family (one md5 base + (a*v+b) mod 2^31-1
    permutations) must equal the hashlib model — signatures and the
    full-band agreement of identical shingle sets."""
    import hashlib

    def bands_py(text):
        import re
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not sh:
            return None
        p = dedup.MINHASH_P31
        vs = [int(hashlib.md5(f"mhbase|{s}".encode()).hexdigest()[:8], 16)
              % p for s in sh]
        mins = []
        for i in range(8):
            a, b = dedup._linear_hash_params(i)
            mins.append(min((a * v + b) % p for v in vs))
        return ["|".join(str(mins[2 * bb + r]) for r in range(2))
                for bb in range(4)]

    # docs fixture provides the shared corpus (doc_id, text)
    rows = docs.select("doc_id", "text").collect()
    want = {r["doc_id"]: bands_py(r["text"]) for r in rows
            if bands_py(r["text"]) is not None}
    got = {r["doc_id"]: [r[f"band_{b}"] for b in range(4)]
           for r in dedup.minhash_signatures(
               docs, "doc_id", "text", 8, 4,
               hash_family="linear").collect()}
    assert got == want

    cands = {(r["a_id"], r["b_id"]): r["n_bands"]
             for r in dedup.minhash_candidates(
                 docs, "doc_id", "text", 8, 4,
                 hash_family="linear").collect()}
    assert cands[(0, 5)] == 4  # identical shingle sets: all bands agree


def test_topk_recall_hand_case(spark):
    """Known overlaps: q1 full recall, q2 half, q3 zero, q4 missing
    from the approx side entirely (recall 0, not dropped); n_exact
    below k divides by n_exact, not k."""
    from qvarn_mr_spark.functions.similarity import topk_recall
    exact = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"),
         ("q2", "a"), ("q2", "b"),
         ("q3", "a"), ("q3", "b"),
         ("q4", "a")],                      # only 1 exact neighbor
        ["q_id", "n_id"])
    approx = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"),
         ("q2", "a"), ("q2", "x"),
         ("q3", "x"), ("q3", "y")],
        ["q_id", "n_id"])
    out = {r["q_id"]: r for r in topk_recall(exact, approx,
                                             k=2).collect()}
    assert out["q1"]["recall"] == 1.0 and out["q1"]["n_hit"] == 2
    assert out["q2"]["recall"] == 0.5
    assert out["q3"]["recall"] == 0.0 and out["q3"]["n_approx"] == 2
    assert out["q4"]["recall"] == 0.0 and out["q4"]["n_approx"] == 0
    # n_exact=1 < k=2: denominator is 1
    exact1 = spark.createDataFrame([("q5", "a")], ["q_id", "n_id"])
    approx1 = spark.createDataFrame([("q5", "a")], ["q_id", "n_id"])
    r5 = topk_recall(exact1, approx1, k=2).collect()[0]
    assert r5["recall"] == 1.0


def test_tune_lsh_bands_monotone_on_partial_dups(spark):
    """The banding dial on a corpus with GENUINE partial-overlap pairs
    (Jaccard ~0.4-0.7, not exact-dup templates): with nested widths
    (8/16/32 bands over 128 hashes) candidate count and recall are
    monotone non-decreasing in n_bands, every true pair found at 8
    bands survives at 32, and prec/recall stay in [0, 1]."""
    import random

    from qvarn_mr_spark.functions.dedup import tune_lsh_bands

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    did = 0
    for g in range(12):
        base = rng.sample(vocab, 40)
        rows.append((did, " ".join(base))); did += 1
        # partial dup: keep ~70% of the words, swap the rest
        kept = base[:28] + rng.sample(vocab, 12)
        rows.append((did, " ".join(kept))); did += 1
    for _ in range(40):   # unrelated background docs
        rows.append((did, " ".join(rng.sample(vocab, 40)))); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["n_bands"]: r for r in tune_lsh_bands(
        df, "doc_id", "text", n_hashes=128, bands_grid=(8, 16, 32),
        threshold=0.3).collect()}
    assert sorted(out) == [8, 16, 32]
    cands = [out[b]["n_candidates"] for b in (8, 16, 32)]
    recs = [out[b]["recall"] for b in (8, 16, 32)]
    assert cands == sorted(cands)
    assert recs == sorted(recs)
    assert all(r is None or 0.0 <= r <= 1.0 for r in recs)
    assert all(out[b]["prec"] is None or 0.0 <= out[b]["prec"] <= 1.0
               for b in out)
    # 32 narrow bands must catch (nearly) everything at this overlap
    assert recs[-1] >= 0.9
    with pytest.raises(ValueError, match="divide"):
        tune_lsh_bands(df, "doc_id", "text", n_hashes=128,
                       bands_grid=(7,))
    with pytest.raises(ValueError, match="grid"):
        tune_lsh_bands(df, "doc_id", "text", bands_grid=())


def test_kmeans_warm_start_identity_and_guards(spark, sf_dir):
    """kmeans_fit(init_centroids=): seeding with the EXACT rounded seed
    vectors of the filter rows reproduces the init_filter run; giving
    both or neither init raises; empty init raises."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import kmeans_fit
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    flt = F.col("vec_id") % 100 == 0
    seeds = [(r["vec_id"], [round(float(x), 6) for x in r["embedding"]])
             for r in emb.filter(flt).collect()]
    cold = kmeans_fit(emb, "vec_id", "embedding", flt, iters=1)
    warm = kmeans_fit(emb, "vec_id", "embedding", iters=1,
                      init_centroids=seeds)
    assert cold == warm
    with pytest.raises(ValueError, match="exactly one"):
        kmeans_fit(emb, "vec_id", "embedding", flt, iters=1,
                   init_centroids=seeds)
    with pytest.raises(ValueError, match="exactly one"):
        kmeans_fit(emb, "vec_id", "embedding", iters=1)
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(emb, "vec_id", "embedding", iters=1,
                   init_centroids=[])


def test_kmeans_warm_start_after_corpus_growth(spark, sf_dir):
    """The IVM story: fit on half the corpus, warm-refit one round on
    the full corpus — the result must equal manually running one Lloyd
    round from those centroids (composition check), and every centroid
    stays k-bounded with the original cluster ids."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import (kmeans_centroids,
                                                     kmeans_fit)
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    pre = emb.filter(F.col("vec_id") % 2 == 0)
    cents = kmeans_fit(pre, "vec_id", "embedding",
                       F.col("vec_id") % 100 == 0, iters=2)
    warm = {(r["cluster_id"], r["pos"]): r["val"]
            for r in kmeans_centroids(emb, "vec_id", "embedding",
                                      iters=1,
                                      init_centroids=cents).collect()}
    ids = {c for c, _ in cents}
    assert {c for c, _ in warm} == ids
    # composition: one warm round == fit(init_centroids, iters=1)
    fit1 = kmeans_fit(emb, "vec_id", "embedding", iters=1,
                      init_centroids=cents)
    flat = {(c, p): v for c, vec in fit1 for p, v in enumerate(vec)}
    assert flat == warm


def test_multi_probe_nprobe1_matches_single_probe(spark, sf_dir):
    """ivf_probe_search_multi(nprobe=1) must equal ivf_probe_search —
    the single-probe operator is the nested base case of the dial."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import (
        ivf_probe_search, ivf_probe_search_multi)
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    kw = dict(centroid_filter=F.col("vec_id") % 100 == 0,
              query_filter=F.col("vec_id") < 10, k=3)
    one = sorted(map(tuple, ivf_probe_search(
        emb, "vec_id", "embedding", **kw).collect()))
    multi = sorted(map(tuple, ivf_probe_search_multi(
        emb, "vec_id", "embedding", nprobe=1, **kw).collect()))
    assert one == multi and len(one) > 0


def test_tune_nprobe_monotone_and_saturates(spark, sf_dir):
    """The tuning table's contract: recall and candidate count are
    monotone non-decreasing in nprobe (nested candidate sets), every
    query appears at every grid point, and nprobe >= nlist reaches
    recall 1.0 (all clusters visited = brute force minus nothing)."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import tune_nprobe
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cents = emb.filter(F.col("vec_id") % 100 == 0).count()
    out = {r["nprobe"]: r for r in tune_nprobe(
        emb, "vec_id", "embedding",
        centroid_filter=F.col("vec_id") % 100 == 0,
        query_filter=F.col("vec_id") < 10, k=3,
        nprobes=(1, 2, cents)).collect()}
    assert sorted(out) == [1, 2, cents]
    nq = {r["n_queries"] for r in out.values()}
    assert nq == {10}
    recs = [out[p]["mean_recall"] for p in sorted(out)]
    cands = [out[p]["n_candidates"] for p in sorted(out)]
    assert recs == sorted(recs), recs
    assert cands == sorted(cands), cands
    assert out[cents]["mean_recall"] == 1.0
    assert all(0.0 <= r <= 1.0 for r in recs)


def test_tune_nprobe_bad_grid_raises(spark, sf_dir):
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import tune_nprobe
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    with pytest.raises(ValueError, match="grid"):
        tune_nprobe(emb, "vec_id", "embedding",
                    centroid_filter=F.col("vec_id") % 100 == 0,
                    query_filter=F.col("vec_id") < 10, nprobes=(0, 2))


def test_topk_recall_clamped_when_exact_exceeds_k(spark):
    """ADVICE r8: an exact input carrying MORE than k rows per query
    (caller broke the top-k contract) used to report recall > 1.0
    (n_hit reaching n_exact=3 over denominator min(k, n_exact)=2).
    Recall is now clamped to 1.0."""
    from qvarn_mr_spark.functions.similarity import topk_recall
    exact = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c")], ["q_id", "n_id"])
    approx = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q1", "c")], ["q_id", "n_id"])
    r = topk_recall(exact, approx, k=2).collect()[0]
    assert r["n_hit"] == 3 and r["n_exact"] == 3
    assert r["recall"] == 1.0


def test_topk_recall_probe_vs_bruteforce_bounds(spark, sf_dir):
    """On the real embeddings: a probe restricted to one IVF cluster
    can never beat exact search (recall <= 1), and probing with the
    exact searcher itself gives recall 1.0 everywhere."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import (ivf_probe_search,
                                                     knn_bruteforce,
                                                     topk_recall)
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    exact = knn_bruteforce(emb, "vec_id", "embedding",
                           query_filter=F.col("vec_id") < 10, k=3)
    self_rec = topk_recall(exact, exact, k=3).collect()
    assert all(r["recall"] == 1.0 for r in self_rec)
    probe = ivf_probe_search(emb, "vec_id", "embedding",
                             centroid_filter=F.col("vec_id") % 100 == 0,
                             query_filter=F.col("vec_id") < 10, k=3)
    rec = topk_recall(exact, probe, k=3).collect()
    assert len(rec) == 10
    assert all(0.0 <= r["recall"] <= 1.0 for r in rec)


def test_tune_lsh_bands_pair_valve(spark):
    """ADVICE r9 / VERDICT r9 item 6: the tuner's exact ground-truth
    join is Sigma df(s)^2-shaped, so a planted hot shingle (one
    3-gram shared by every doc) must trip the up-front max_pairs
    valve; under the cap the result is identical to running with the
    valve disengaged."""
    import random

    from qvarn_mr_spark.functions.dedup import tune_lsh_bands

    rng = random.Random(31)
    vocab = [f"v{i}" for i in range(300)]
    hot = "alpha beta gamma"          # one shingle in EVERY doc
    rows = [(i, hot + " " + " ".join(rng.sample(vocab, 20)))
            for i in range(40)]       # df(hot)=40 -> 780 pairs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_pairs"):
        tune_lsh_bands(df, "doc_id", "text", n_hashes=16,
                       bands_grid=(4,), max_pairs=100)
    capped = tune_lsh_bands(df, "doc_id", "text", n_hashes=16,
                            bands_grid=(4,), max_pairs=10 ** 9).collect()
    unguarded = tune_lsh_bands(df, "doc_id", "text", n_hashes=16,
                               bands_grid=(4,), max_pairs=None).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, unguarded))
    assert len(capped) == 1 and capped[0]["n_bands"] == 4


def test_kmeans_centroids_init_guard(spark, sf_dir):
    """ADVICE r9: kmeans_centroids must enforce the same exactly-one
    init contract as kmeans_fit on EVERY path — the iters<=0 fast path
    used to reach df.filter(None) with an opaque error."""
    from pyspark.sql import functions as F

    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import kmeans_centroids
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    with pytest.raises(ValueError, match="exactly one"):
        kmeans_centroids(emb, "vec_id", "embedding", iters=0)
    with pytest.raises(ValueError, match="exactly one"):
        kmeans_centroids(emb, "vec_id", "embedding",
                         init_filter=F.col("vec_id") % 100 == 0, iters=0,
                         init_centroids=[(0, [0.0] * 16)])
    with pytest.raises(ValueError, match="exactly one"):
        kmeans_centroids(emb, "vec_id", "embedding", iters=2)


def test_hybrid_search_fusion_semantics(spark):
    """r10 hybrid retrieval: a doc ranked top by BOTH legs must win the
    fusion over docs that top only one leg; absent legs contribute 0;
    empty query guards raise."""
    from qvarn_mr_spark.functions.similarity import hybrid_search

    docs = spark.createDataFrame([
        (1, "spark spark spark shuffle"),      # lexical winner
        (2, "spark shuffle partitions"),       # both legs strong
        (3, "rivers mountains weather"),       # neither
    ], "doc_id long, text string")
    emb = spark.createDataFrame([
        (1, [0.0, 1.0]),                       # orthogonal to query
        (2, [1.0, 0.05]),                      # near the query vector
        (3, [0.9, 0.4]),
    ], "doc_id long, embedding array<float>")
    out = {r["doc_id"]: r for r in hybrid_search(
        docs, emb, ["spark", "shuffle"], [1.0, 0.0],
        vec_id_col="doc_id", k=3, pool=3).collect()}
    # doc 2: lex rank 2 + vec rank 1 beats doc 1 (lex 1, vec 3)
    assert out[2]["rn"] == 1
    assert out[2]["lex_rank"] == 2 and out[2]["vec_rank"] == 1
    assert out[1]["lex_rank"] == 1
    # doc 3 matched no query term: lexical leg absent, vector only
    assert out[3]["lex_rank"] is None and out[3]["vec_rank"] == 2
    # rrf arithmetic: 1/(60+rank) sums, rounded to 6
    assert out[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert out[3]["rrf_score"] == round(1 / 62, 6)

    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        hybrid_search(docs, emb, [], [1.0, 0.0], vec_id_col="doc_id")
    with _pt.raises(ValueError, match="non-empty"):
        hybrid_search(docs, emb, ["spark"], [], vec_id_col="doc_id")


def test_hybrid_search_pool_bounds_fusion(spark):
    """The pool cap truncates each leg BEFORE fusion: a doc outside a
    leg's top-pool gets no rank from that leg even if it matches."""
    from qvarn_mr_spark.functions.similarity import hybrid_search

    # doc i repeats 'term' (10 - i) times: lexical order 0,1,2,...
    docs = spark.createDataFrame(
        [(i, " ".join(["term"] * (10 - i))) for i in range(6)],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(6)],
        "doc_id long, embedding array<float>")
    out = {r["doc_id"]: r for r in hybrid_search(
        docs, emb, ["term"], [1.0, 0.0],
        vec_id_col="doc_id", k=6, pool=2).collect()}
    # only docs 0,1 carry a lex_rank (pool=2); 2..5 fused vector-only
    assert out[0]["lex_rank"] == 1 and out[1]["lex_rank"] == 2
    assert all(out[i]["lex_rank"] is None for i in (2, 3, 4, 5)
               if i in out)


def test_hybrid_search_ivf_matches_bruteforce_when_pool_exact(spark):
    """r11 (VERDICT r10 #6): hybrid_search_ivf with nprobe = nlist
    probes EVERY cluster, so the probed vector pool equals the exact
    pool and the fused table must EQUAL brute-force hybrid_search —
    the fusion is leg-implementation-independent. At nprobe=1 the
    probed leg is a strict subset and the fusion still runs (vector
    ranks come from the probed cluster only)."""
    from qvarn_mr_spark.functions.similarity import (
        hybrid_search,
        hybrid_search_ivf,
    )

    docs = spark.createDataFrame(
        [(i, f"term{i % 3} spark shuffle doc{i}") for i in range(12)],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, [1.0 + 0.01 * i, float(i % 4), 0.5 * (i % 3)])
         for i in range(12)],
        "doc_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
             (2, [0.0, 0.0, 1.0])]
    q = ["spark", "term1"]
    qv = [1.0, 0.3, 0.1]

    want = {tuple(r) for r in hybrid_search(
        docs, emb, q, qv, vec_id_col="doc_id", k=8, pool=6).collect()}
    got = {tuple(r) for r in hybrid_search_ivf(
        docs, emb, q, qv, cents, nprobe=3,
        vec_id_col="doc_id", k=8, pool=6).collect()}
    assert got == want

    # nprobe=1: probed pool ⊆ exact pool; fused rows still rank k-deep
    # and every vec_rank-ed doc belongs to the probed cluster
    from qvarn_mr_spark.functions.similarity import (
        ivf_cluster_col,
        ivf_route_col,
    )
    narrow = hybrid_search_ivf(docs, emb, q, qv, cents, nprobe=1,
                               vec_id_col="doc_id", k=8, pool=6)
    probed = spark.createDataFrame([(qv,)], "q array<double>").select(
        ivf_route_col("q", cents, 1)[0].alias("c")).collect()[0]["c"]
    members = {r["doc_id"] for r in emb.select(
        F.col("doc_id"),
        ivf_cluster_col("embedding", cents).alias("c"))
        .filter(F.col("c") == probed).collect()}
    for r in narrow.collect():
        if r["vec_rank"] is not None:
            assert r["doc_id"] in members


def test_r11_edge_guards(spark, tmp_path, sf_dir):
    """ADVICE-r10 discipline over the r10/r11 additions: empty probe
    deltas (both maintained-index and partitioned-layout probes) return
    empty instead of crashing, pool < k bounds recall not correctness,
    and an LM export over a token-less corpus fails at fit time."""
    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.similarity import (
        hybrid_search,
        ivf_member_struct,
        ivf_cluster_col,
        probe_ivf_index,
        probe_ivf_partitioned,
        write_ivf_partitioned,
    )
    from qvarn_mr_spark.functions.text import export_unigram_lm

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cents = [(r["vec_id"], list(r["c"])) for r in
             emb.filter(F.col("vec_id") % 100 == 0)
             .select("vec_id",
                     F.col("embedding").cast("array<double>").alias("c"))
             .collect()]
    none = emb.filter(F.lit(False))

    # empty delta against the maintained index: zero rows, no crash
    idx = emb.select(
        ivf_cluster_col("embedding", cents).cast("string")
        .alias("_mr_key"),
        ivf_member_struct("vec_id", "embedding").alias("_mr_value"))
    assert probe_ivf_index(none, idx, cents,
                           "vec_id", "embedding", k=3).count() == 0

    # empty probed set against the partitioned layout (manifest-empty
    # read path): literal IN () prunes everything, returns empty
    path = str(tmp_path / "layout")
    write_ivf_partitioned(emb, path, cents, "vec_id", "embedding")
    assert probe_ivf_partitioned(spark, path, none, cents,
                                 "vec_id", "embedding", k=3).count() == 0

    # pool < k: ≤ 2·pool fused docs, correctness intact
    docs = spark.createDataFrame(
        [(i, f"term doc{i}") for i in range(8)],
        "doc_id long, text string")
    e2 = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(8)],
        "doc_id long, embedding array<float>")
    rows = hybrid_search(docs, e2, ["term"], [1.0, 0.0],
                         vec_id_col="doc_id", k=6, pool=2).collect()
    assert 0 < len(rows) <= 4 and all(r["rn"] <= 6 for r in rows)
    import pytest as _pt
    with _pt.raises(ValueError, match=">= 1"):
        hybrid_search(docs, e2, ["term"], [1.0, 0.0],
                      vec_id_col="doc_id", k=0)

    # LM export on a token-less corpus fails at FIT time
    empty_docs = spark.createDataFrame(
        [("d", "   ")], "doc_id string, text string")
    with _pt.raises(ValueError, match="no tokens"):
        export_unigram_lm(empty_docs)


def test_warm_fixture_staging_identical(spark, sf_dir, tmp_path):
    """bench.py's per-process warm-fixture staging (VERDICT r13 #8) is
    value-invisible: every warm query returns identical rows whether its
    pre-delta fixture is built inline (the driver-correctness path) or
    read back from the staged copy (the bench path)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = sorted(entry.WARM_FIXTURE_BUILDERS)
    cold = {n: sorted(map(tuple, qs[n](spark, sf_dir).collect()))
            for n in names}
    prep = entry.bench_stage_warm_fixtures(spark, sf_dir, str(tmp_path),
                                           names=set(names))
    try:
        assert set(prep) == set(names)
        for n in names:
            staged = sorted(map(tuple, qs[n](spark, sf_dir).collect()))
            assert staged == cold[n], n
    finally:
        entry._WARM_FIXTURE_DIR = None
