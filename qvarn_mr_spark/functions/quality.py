"""Corpus-quality signals, benchmark decontamination, and PII scrubbing.

LLM training-data pipeline operators beyond the reference's surface (the
reference's closest analogue is the map/reduce word statistics family,
``/root/reference/qvarnmr/func.py``): Gopher-style repetition ratios,
eval-set contamination detection by shared word n-grams, corpus-wide n-gram
frequency, and regex PII detection/redaction.

All per-document signals are single-pass JVM Column expressions over the
token array (no explode, no shuffle, no Python) — at 100 TB they run inside
the scan stage. The cross-document operators (contamination, top n-grams)
reuse the dedup module's exploded-shingle shape: one shuffle on the shingle
key, never an all-pairs join; the eval-set side of the contamination join is
a distinct-shingle table that AQE will broadcast when genuinely small.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qvarn_mr_spark.functions.dedup import (
    SHINGLE_K,
    ensure_min_partitions,
    shingles_col,
    shingle_table,
    tokens_col,
)

#: word-gram width for eval-set contamination checks. 4 is the smallest
#: width at which the synthetic corpus separates (3-grams flag ~84% of docs,
#: 4-grams ~10%); real pipelines use 8-13 (e.g. 13-gram decontamination in
#: GPT-3's appendix) — pass k explicitly for that.
DECONTAM_K = 4

#: conservative PII patterns valid in BOTH Java regex (Spark) and RE2-ish
#: engines: no backrefs, no lookarounds.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+\d[\d().\- ]{7,}\d",
}


def _dup_frac(grams: Column) -> Column:
    """1 - distinct/total over a gram array; 0.0 for empty docs."""
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(F.round(
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
        6))


def repetition_signals(text_col: str) -> dict[str, Column]:
    """The raw signal Columns behind :func:`repetition_profile` — importable
    by composed pipelines that want the gates without the fixed schema."""
    t = tokens_col(text_col)
    n = F.size(t)
    # most-frequent-word count = longest equal run of the SORTED tokens,
    # found by one aggregate() fold — O(n log n) per row. The obvious
    # transform(distinct, w -> size(filter(t, = w))) is O(distinct x n)
    # AND allocates a filtered array per distinct word inside the
    # interpreted higher-order eval (measured 10x slower at sf0.1).
    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc.best, run).alias("best"))

    top_count = F.aggregate(
        F.array_sort(t),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        step,
        lambda acc: acc.best)
    return {
        "dup_word_frac": _dup_frac(t),
        "dup_2gram_frac": _dup_frac(shingles_col(text_col, 2)),
        "dup_3gram_frac": _dup_frac(shingles_col(text_col, 3)),
        "top_word_frac": F.when(n <= 0, F.lit(0.0)).otherwise(
            F.round(top_count.cast("double") / n, 6)),
    }


def repetition_profile(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document repetition signals (the Gopher-rule family): duplicate
    word / 2-gram / 3-gram fractions and the most-frequent-word mass.

    Everything is computed from one tokenized array per row with array
    higher-order functions — a narrow projection, no shuffle, no UDF. The
    ``top_word_frac`` inner loop is O(distinct_words x tokens) per row,
    bounded by document length, not corpus size."""
    sig = repetition_signals(text_col)
    t = tokens_col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(t).cast("long").alias("n_tokens"),
        *(c.alias(name) for name, c in sig.items()),
    )


def contamination(df: DataFrame, eval_df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = DECONTAM_K) -> DataFrame:
    """Documents sharing at least one word ``k``-gram with an eval/benchmark
    set → ``(doc_id, n_shared)`` distinct-shared-gram counts.

    Shape: distinct (doc, shingle) x distinct eval shingle equi-join — one
    shuffle on the shingle key. The eval side is benchmark-sized (millions
    of grams, not billions), so AQE broadcasts it; the corpus side never
    self-joins. This is the standard industrial decontamination pass."""
    sh = shingle_table(ensure_min_partitions(df), id_col, text_col, k)
    ev = (shingle_table(eval_df, id_col, text_col, k)
          .select("shingle").distinct())
    return (sh.join(ev, "shingle")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))


def decontaminate(df: DataFrame, eval_df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = DECONTAM_K) -> DataFrame:
    """The filter form: drop every document flagged by :func:`contamination`
    (left-anti join on the hit list, which is hit-count-sized)."""
    hits = contamination(df, eval_df, id_col, text_col, k)
    return df.join(hits.select(F.col("doc_id").alias(id_col)), id_col,
                   "left_anti")


def bloom_decontaminate(df: DataFrame, eval_df: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = DECONTAM_K,
                        num_bits: int | None = None,
                        num_hashes: int = 4) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter: build a Bloom filter
    over the eval set's distinct ``k``-grams (kilobytes), broadcast it as
    one packed row, and drop corpus shingles map-side BEFORE the exact
    equi-join verify.

    Output is IDENTICAL to :func:`decontaminate` — Bloom has no false
    negatives, and the exact verify removes its false positives — but at
    100 TB the shuffle into the verify join carries only bloom-positive
    shingles (the eval-overlap + ~1 % FP fraction of the corpus) instead
    of every corpus shingle. This is the standard runtime-filter /
    semi-join-pushdown pattern, made explicit and composable."""
    from qvarn_mr_spark.functions import sketches as sk

    bits = num_bits if num_bits is not None else sk.BLOOM_BITS
    ev = (shingle_table(eval_df, id_col, text_col, k)
          .select("shingle").distinct())
    packed = sk.bloom_pack(
        sk.bloom_rollup(ev, [], "shingle", bits, num_hashes), bits)
    sh = shingle_table(ensure_min_partitions(df), id_col, text_col, k)
    candidates = (sh.join(F.broadcast(packed))  # 1 row, kilobytes
                  .filter(sk.bloom_might_contain(
                      F.col("bloom"), F.col("shingle"), bits, num_hashes))
                  .drop("bloom"))
    hits = candidates.join(ev, "shingle").select("doc_id").distinct()
    return df.join(hits.select(F.col("doc_id").alias(id_col)), id_col,
                   "left_anti")


def minhash_contamination(df: DataFrame, eval_df: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          n_hashes: int | None = None,
                          n_bands: int | None = None) -> DataFrame:
    """FUZZY decontamination flags: training documents that NEAR-duplicate
    an eval/benchmark document (MinHash band collision), not merely share
    one exact k-gram — the paraphrased-benchmark leak that
    :func:`contamination` misses and modern training-data audits check
    for. Returns ``(doc_id, n_shared_bands)``: how many of the doc's LSH
    bands collide with any eval doc's band (``n_bands`` of ``n_bands``
    ≈ certain duplicate; 1 = candidate).

    Scale shape — nothing corpus-sized ever shuffles: the EVAL side runs
    the full signature pipeline (benchmark-sized, one small groupBy);
    the CORPUS side computes its band keys as a per-row Column
    expression (:func:`qvarn_mr_spark.functions.dedup.
    minhash_band_keys_col` — the same twin that powers the maintained
    LSH index) in one narrow pass, and the distinct eval key set
    equi-joins it (AQE broadcasts the benchmark-sized build side). The
    aggregation output is bounded by the collision count."""
    from qvarn_mr_spark.functions.dedup import (
        MINHASH_BANDS,
        MINHASH_N,
        minhash_band_keys_col,
        minhash_signatures,
    )

    n_hashes = MINHASH_N if n_hashes is None else n_hashes
    n_bands = MINHASH_BANDS if n_bands is None else n_bands
    ev = minhash_signatures(eval_df, id_col, text_col, n_hashes, n_bands)
    ev_keys = ev.select(F.explode(F.array(*[
        F.concat_ws("|", F.lit(str(b)), F.col(f"band_{b}"))
        for b in range(n_bands)])).alias("_k")).distinct()
    corpus_keys = ensure_min_partitions(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(minhash_band_keys_col(text_col, n_hashes, n_bands))
        .alias("_k"))
    # explicit broadcast: the eval key set is benchmark-bounded (NOT
    # corpus-cardinality — the r4 hint rule), and pinning it keeps the
    # join map-side at every scale instead of letting AQE broadcast the
    # corpus side when a small test corpus happens to be the smaller one
    return (corpus_keys.join(F.broadcast(ev_keys), "_k")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared_bands")))


def minhash_decontaminate(df: DataFrame, eval_df: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_bands: int = 1,
                          n_hashes: int | None = None,
                          n_bands: int | None = None) -> DataFrame:
    """The filter form of :func:`minhash_contamination`: drop every
    document whose band-collision count reaches ``min_bands`` (left-anti
    join on the hit list, which is hit-count-sized). ``min_bands=1`` is
    the aggressive audit setting; raise it to only drop near-certain
    duplicates."""
    hits = (minhash_contamination(df, eval_df, id_col, text_col,
                                  n_hashes, n_bands)
            .filter(F.col("n_shared_bands") >= min_bands))
    return df.join(hits.select(F.col("doc_id").alias(id_col)), id_col,
                   "left_anti")


def top_ngrams(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = SHINGLE_K,
               top_n: int = 20) -> DataFrame:
    """Corpus-wide most frequent word ``k``-grams with document frequency —
    the repetition / boilerplate audit view.

    One explode + one hash aggregate; the final top-N is a
    TakeOrderedAndProject (per-partition partial top-N, no global sort).
    Ties break on the gram text for determinism."""
    grams = ensure_min_partitions(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(text_col, k)).alias("shingle"))
    return (grams.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy(F.desc("tf"), F.asc("shingle"))
            .limit(top_n))


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_docs: int = 2,
               min_chars: int = 1, delimiter: str = "\n",
               joiner: str | None = None,
               min_doc_frac: float | None = None) -> DataFrame:
    """CCNet-style line-level dedup: remove every line (``delimiter``-split
    segment, regex) whose normalized form (lower+trim) appears in at least
    ``min_docs`` distinct documents — the standard boilerplate-stripping
    pass (headers, footers, nav bars) run before document-level dedup.
    ``min_doc_frac`` switches the threshold to a fraction of the corpus
    (``ceil(frac * n_docs)``), which is what real pipelines use so the
    cutoff tracks corpus growth.

    Returns ``(doc_id, text, n_lines, n_removed)`` with surviving lines
    rejoined in original order.

    Scale shape: only *distinct normalized line keys* per document are
    exploded and shuffled (never full lines with positions) — one hash
    aggregate on the key, then the per-document bad-key sets (usually
    tiny) join back and the original line array is filtered in place, so
    there is no reassembly shuffle and line order is preserved for free.
    The fraction threshold is a 1-row count broadcast, not a collect."""
    lines = F.split(F.col(text_col), delimiter, -1)

    def key(line: Column) -> Column:
        return F.lower(F.trim(line))

    keys = F.array_distinct(F.filter(
        F.transform(lines, key),
        lambda k: F.length(k) >= min_chars))
    doc_keys = df.select(F.col(id_col).alias("doc_id"),
                         F.explode(keys).alias("line_key"))
    # keys are distinct per doc, so count(*) == distinct-doc frequency
    counts = doc_keys.groupBy("line_key").agg(
        F.count(F.lit(1)).alias("_n_docs"))
    if min_doc_frac is not None:
        total = df.select(F.count(F.lit(1)).alias("_total"))
        dup = (counts.crossJoin(total)
               .filter(F.col("_n_docs") >=
                       F.ceil(F.lit(float(min_doc_frac)) * F.col("_total")))
               .select("line_key"))
    else:
        dup = counts.filter(F.col("_n_docs") >= min_docs).select("line_key")
    doc_bad = (doc_keys.join(dup, "line_key")
               .groupBy("doc_id")
               .agg(F.array_sort(F.collect_list("line_key")).alias("_bad")))
    bad = F.coalesce(F.col("_bad"), F.array().cast("array<string>"))
    kept = F.filter(lines, lambda l: ~F.array_contains(bad, key(l)))
    return (df.join(doc_bad.withColumnRenamed("doc_id", id_col),
                    id_col, "left")
            .select(F.col(id_col).alias("doc_id"),
                    F.concat_ws(joiner if joiner is not None else delimiter,
                                kept).alias("text"),
                    F.size(lines).cast("long").alias("n_lines"),
                    (F.size(lines) - F.size(kept)).cast("long")
                    .alias("n_removed")))


def pii_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-document PII match counts (``n_email``/``n_ipv4``/
    ``n_phone``) — pure ``regexp_count`` Column expressions, scan-stage
    work at any scale."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"))
    return out


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace PII matches with ``[EMAIL]``/``[IPV4]``/``[PHONE]`` tokens —
    chained ``regexp_replace``, still one narrow projection."""
    c: Column = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return df.withColumn(out_col or text_col, c)


def compression_ratio(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio ``compressed/raw`` — the
    classic cheap redundancy signal (highly repetitive or templated text
    compresses far below ~0.4; high-entropy garbage stays near 1.0).
    Complements the n-gram repetition ratios: zlib sees long-range and
    sub-token redundancy that word-gram fractions miss.

    Arrow-batched ``mapInPandas`` (stdlib ``zlib``, one C call per doc,
    no shuffle) — this is the documented exception to the
    Column-expression rule: there is no JVM-side compressor exposed to
    SQL, and the per-batch Python cost is one vectorized loop of C
    calls. Only the two byte LENGTHS cross the Python boundary; the
    ratio divides and rounds JVM-side — Python's ``round`` is banker's
    (half-to-even) while Spark/DuckDB round half away from zero, and
    power-of-two byte counts land quotients EXACTLY on .5 boundaries
    (93/128 = 0.7265625), so a Python-side round would diverge from the
    SQL oracle. Returns ``(doc_id, n_bytes, ratio)``; empty docs report
    ratio 1.0."""
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nb, nc = [], [], []
            for i, t in zip(pdf["_id"], pdf["_text"]):
                raw = (t or "").encode("utf-8")
                ids.append(i)
                nb.append(len(raw))
                nc.append(len(zlib.compress(raw, level)))
            yield pd.DataFrame({"doc_id": ids, "n_bytes": nb,
                                "_n_comp": nc})

    src = df.select(F.col(id_col).alias("_id"),
                    F.col(text_col).alias("_text"))
    lens = src.mapInPandas(
        batches, "doc_id long, n_bytes long, _n_comp long")
    return lens.select(
        "doc_id", "n_bytes",
        F.when(F.col("n_bytes") == 0, F.lit(1.0))
        .otherwise(F.round(F.try_divide(F.col("_n_comp"),
                                        F.col("n_bytes")), 6))
        .alias("ratio"))


def perplexity_cut_points(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", by: str = "lang",
                          n_buckets: int = 3,
                          smoothing: float = 0.5) -> DataFrame:
    """Per-group surprisal cut points for the threshold form of
    :func:`perplexity_buckets`: one ``percentile_approx`` aggregate over
    the corpus-fitted unigram surprisal, ``n_buckets - 1`` quantiles per
    ``by`` group. Returns ``(<by>, _cuts array<double>)`` — a tiny frame
    (one row per group) meant to be broadcast. Deterministic for a given
    corpus (the KLL-style sketch is deterministic over the input
    multiset), which is what lets the cuts commit to a sidecar and the
    bucket assignment replay exactly in SQL."""
    from qvarn_mr_spark.functions.text import unigram_surprisal

    sur = unigram_surprisal(df, id_col, text_col, smoothing=smoothing)
    keyed = sur.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(by)), "doc_id")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return keyed.groupBy(by).agg(F.percentile_approx(
        "mean_nll", qs, 100_000).alias("_cuts"))


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", by: str = "lang",
                       n_buckets: int = 3, smoothing: float = 0.5,
                       method: str = "ntile") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document with the corpus-fitted unigram-LM surprisal
    (:func:`~qvarn_mr_spark.functions.text.unigram_surprisal` — the
    engine-native stand-in for CCNet's KenLM) and split each ``by``
    group (language, in CCNet) into ``n_buckets`` equal-frequency
    buckets of rising surprisal. ``n_buckets=3`` labels them
    ``head``/``middle``/``tail`` — CCNet trains on head+middle and
    drops the tail. Documents with no tokens have no surprisal and are
    absent, mirroring the surprisal operators. Returns
    ``(doc_id, <by>, n_tokens, mean_nll, bucket, bucket_label)`` with
    ``bucket`` in ``1..n_buckets``.

    Two methods, one semantics dial:

    - ``method="ntile"`` (default, value-oracled): exact equal-frequency
      split via ``ntile`` ordered by ``(mean_nll, doc_id)`` — the
      doc_id tiebreak makes the assignment total and deterministic, so
      a DuckDB twin hash-matches. The window partitions by ``by``:
      every group sorts in ONE task, which is exact but group-skewed —
      fine up to ~10^8 docs per language, not the 100 TB shape.
    - ``method="thresholds"`` (the scale path): per-group surprisal
      cut points from one ``percentile_approx`` aggregate (B-bounded
      sketch state), broadcast back, bucket = 1 + #cuts below the doc's
      score — assignment happens in the scan stage with no per-group
      sort at all. Deterministic; the sketch cuts are approximate
      rank-wise (ties share a bucket; bucket sizes are ~equal, not
      exactly equal), but since the cut VALUES are deterministic they
      commit to a sidecar and the assignment replays exactly in SQL
      (``oracle.perplexity_buckets_dispatch_sql``).

    No reference analogue (the reference has no scoring operators); the
    closest shape is its map/reduce word statistics
    (``/root/reference/qvarnmr/func.py``)."""
    from pyspark.sql import Window

    from qvarn_mr_spark.functions.text import unigram_surprisal

    sur = unigram_surprisal(df, id_col, text_col, smoothing=smoothing)
    keyed = sur.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(by)), "doc_id")
    if method == "ntile":
        w = Window.partitionBy(by).orderBy("mean_nll", "doc_id")
        bucket = F.ntile(n_buckets).over(w)
    elif method == "thresholds":
        cuts = perplexity_cut_points(df, id_col, text_col, by=by,
                                     n_buckets=n_buckets,
                                     smoothing=smoothing)
        keyed = keyed.join(F.broadcast(cuts), by)
        bucket = F.lit(1) + F.aggregate(
            "_cuts", F.lit(0),
            lambda acc, c: acc + F.when(F.col("mean_nll") > c,
                                        F.lit(1)).otherwise(F.lit(0)))
    else:
        raise ValueError(f"unknown method: {method!r}")
    if n_buckets == 3:
        label = (F.when(bucket == 1, "head")
                 .when(bucket == 2, "middle").otherwise("tail"))
    else:
        label = F.concat(F.lit("b"), bucket.cast("string"))
    return keyed.select("doc_id", by, "n_tokens", "mean_nll",
                        bucket.cast("int").alias("bucket"),
                        label.alias("bucket_label"))


# ---------------------------------------------------------------------------
# C4-style rule filters (Raffel et al. 2020, §2.2 "Colossal Clean Crawled
# Corpus" heuristics) — pure Column expressions, scan-stage at any scale.
# ---------------------------------------------------------------------------

#: Minimal standalone-word blocklist (the C4 paper gates on the public
#: "List of Dirty, Naughty ..." list; a handful of its safest entries is
#: enough to pin the mechanism — deployments swap in the full list).
C4_BLOCKLIST = ("porn", "casino", "viagra", "xxx")

#: Boilerplate phrases whose presence marks a policy/consent page.
C4_POLICY_PHRASES = ("terms of use", "privacy policy", "cookie policy",
                     "uses cookies")


def c4_signals(text_col: str = "text") -> dict:
    """The C4 paper's page-level heuristics as named Column expressions:
    word count and mean word length (Gopher also bounds these), the
    "lorem ipsum" and curly-brace (code) markers, policy-phrase hits,
    blocklist hits, and the per-line statistics (fraction of non-empty
    lines ending in terminal punctuation / holding >= 5 words). All
    whole-stage-codegen JVM; no UDF, no shuffle."""
    t = F.col(text_col)
    low = F.lower(t)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(words, F.lit(0).cast("long"),
                          lambda acc, w: acc + F.length(w))
    mean_word_len = F.when(n_words > 0,
                           sum_len.cast("double") / n_words) \
                     .otherwise(F.lit(0.0))
    lines = F.filter(F.split(t, "\n"),
                     lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines).cast("long")
    term = F.size(F.filter(
        lines, lambda l: F.trim(l).rlike('[.!?"]$'))).cast("long")
    ge5 = F.size(F.filter(
        lines,
        lambda l: F.size(F.filter(F.split(F.trim(l), r"\s+"),
                                  lambda w: F.length(w) > 0)) >= 5)
        ).cast("long")
    frac = lambda num: F.when(n_lines > 0,
                              num.cast("double") / n_lines) \
                        .otherwise(F.lit(0.0))
    policy_hits = sum(
        (F.when(F.contains(low, F.lit(p)), 1).otherwise(0)
         for p in C4_POLICY_PHRASES), F.lit(0)).cast("long")
    bad_pat = r"\b(" + "|".join(C4_BLOCKLIST) + r")\b"
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "has_lorem": F.contains(low, F.lit("lorem ipsum")),
        "has_brace": F.contains(t, F.lit("{")),
        "policy_hits": policy_hits,
        "has_blockword": low.rlike(bad_pat),
        "frac_lines_terminal": frac(term),
        "frac_lines_ge5_words": frac(ge5),
    }


def c4_rule_profile(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    min_words: int = 25, max_words: int = 100000,
                    min_terminal_frac: float = 0.0,
                    digits: int = 4) -> DataFrame:
    """Per-document C4 signal profile + the composed ``kept`` verdict.
    One projection over the scan; the driver query value-oracles every
    signal against the DuckDB twin (oracle.c4_rules_sql)."""
    s = c4_signals(text_col)
    kept = ((s["n_words"] >= min_words) & (s["n_words"] <= max_words)
            & ~s["has_lorem"] & ~s["has_brace"]
            & (s["policy_hits"] == 0) & ~s["has_blockword"]
            & (s["frac_lines_terminal"] >= min_terminal_frac))
    return df.select(
        F.col(id_col),
        s["n_words"].alias("n_words"),
        F.round(s["mean_word_len"], digits).alias("mean_word_len"),
        s["has_lorem"].alias("has_lorem"),
        s["has_brace"].alias("has_brace"),
        s["policy_hits"].alias("policy_hits"),
        s["has_blockword"].alias("has_blockword"),
        F.round(s["frac_lines_terminal"], digits)
         .alias("frac_lines_terminal"),
        F.round(s["frac_lines_ge5_words"], digits)
         .alias("frac_lines_ge5_words"),
        kept.alias("kept"))


def c4_filter(df: DataFrame, text_col: str = "text",
              min_words: int = 25, max_words: int = 100000,
              min_terminal_frac: float = 0.0) -> DataFrame:
    """Keep only documents passing the composed C4 rules — the gate form
    for pipelines (scan-stage predicate; stacks with corpus_prepare's
    quality gate so rejected docs never reach the dedup shuffle)."""
    s = c4_signals(text_col)
    return df.filter(
        (s["n_words"] >= min_words) & (s["n_words"] <= max_words)
        & ~s["has_lorem"] & ~s["has_brace"]
        & (s["policy_hits"] == 0) & ~s["has_blockword"]
        & (s["frac_lines_terminal"] >= min_terminal_frac))


#: Gopher (Rae et al. 2021, A1.1): a page must contain at least two of
#: these English function words — the cheap language/garbage floor.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")

#: Line prefixes treated as bullets by the Gopher bullet-line rule.
GOPHER_BULLETS = ("•", "‣", "-", "*")


def gopher_signals(text_col: str = "text") -> dict:
    """The Gopher paper's page-quality heuristics (Rae et al. 2021,
    A1.1) as named Column expressions — the companion set to
    :func:`c4_signals` (word count and mean word length live THERE;
    this adds the rules C4 lacks): symbol-to-word ratio ('#' and
    ellipsis occurrences per word), fraction of lines starting with a
    bullet / ending with an ellipsis, fraction of words containing an
    alphabetic character, and the distinct-stopword floor. All
    whole-stage-codegen JVM; no UDF, no shuffle."""
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words).cast("long")
    # occurrence counts via non-overlapping replace (both engines
    # replace leftmost-first, so the counts agree exactly)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#")))
    n_dots = (F.length(t)
              - F.length(F.replace(t, F.lit("...")))) / F.lit(3)
    n_uni = F.length(t) - F.length(F.replace(t, F.lit("…")))
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_dots + n_uni).cast("double") / n_words) \
        .otherwise(F.lit(0.0))
    lines = F.filter(F.split(t, "\n"),
                     lambda line: F.length(F.trim(line)) > 0)
    n_lines = F.size(lines).cast("long")
    bullet = F.size(F.filter(
        lines,
        lambda line: reduce(
            lambda a, b: a | b,
            [F.startswith(F.ltrim(line), F.lit(p))
             for p in GOPHER_BULLETS]))).cast("long")
    ell = F.size(F.filter(
        lines,
        lambda line: F.endswith(F.rtrim(line), F.lit("..."))
        | F.endswith(F.rtrim(line), F.lit("…")))).cast("long")
    lfrac = lambda num: F.when(n_lines > 0,
                               num.cast("double") / n_lines) \
        .otherwise(F.lit(0.0))
    alpha = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    alpha_frac = F.when(n_words > 0,
                        alpha.cast("double") / n_words) \
        .otherwise(F.lit(0.0))
    low_words = F.transform(words, lambda w: F.lower(w))
    n_stop = sum(
        (F.when(F.array_contains(low_words, s), 1).otherwise(0)
         for s in GOPHER_STOPWORDS), F.lit(0)).cast("long")
    return {
        "symbol_word_ratio": symbol_ratio,
        "frac_bullet_lines": lfrac(bullet),
        "frac_ellipsis_lines": lfrac(ell),
        "frac_alpha_words": alpha_frac,
        "n_stopwords": n_stop,
    }


def gopher_rule_profile(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        min_words: int = 50, max_words: int = 100000,
                        min_mean_word_len: float = 3.0,
                        max_mean_word_len: float = 10.0,
                        max_symbol_ratio: float = 0.1,
                        max_bullet_frac: float = 0.9,
                        max_ellipsis_frac: float = 0.3,
                        min_alpha_frac: float = 0.8,
                        min_stopwords: int = 2,
                        digits: int = 4) -> DataFrame:
    """Per-document Gopher signal profile + the composed ``kept``
    verdict at the paper's published thresholds (50–100k words, mean
    word length 3–10, symbol ratio ≤ 0.1, < 90% bullet lines, < 30%
    ellipsis lines, ≥ 80% alphabetic words, ≥ 2 distinct stopwords).
    One projection over the scan; value-oracled signal-for-signal
    (oracle.gopher_rules_sql)."""
    c4 = c4_signals(text_col)
    g = gopher_signals(text_col)
    kept = ((c4["n_words"] >= min_words) & (c4["n_words"] <= max_words)
            & (c4["mean_word_len"] >= min_mean_word_len)
            & (c4["mean_word_len"] <= max_mean_word_len)
            & (g["symbol_word_ratio"] <= max_symbol_ratio)
            & (g["frac_bullet_lines"] <= max_bullet_frac)
            & (g["frac_ellipsis_lines"] <= max_ellipsis_frac)
            & (g["frac_alpha_words"] >= min_alpha_frac)
            & (g["n_stopwords"] >= min_stopwords))
    return df.select(
        F.col(id_col),
        c4["n_words"].alias("n_words"),
        F.round(c4["mean_word_len"], digits).alias("mean_word_len"),
        F.round(g["symbol_word_ratio"], digits)
         .alias("symbol_word_ratio"),
        F.round(g["frac_bullet_lines"], digits)
         .alias("frac_bullet_lines"),
        F.round(g["frac_ellipsis_lines"], digits)
         .alias("frac_ellipsis_lines"),
        F.round(g["frac_alpha_words"], digits).alias("frac_alpha_words"),
        g["n_stopwords"].alias("n_stopwords"),
        kept.alias("kept"))


def gopher_filter(df: DataFrame, text_col: str = "text",
                  min_words: int = 50, max_words: int = 100000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_symbol_ratio: float = 0.1,
                  max_bullet_frac: float = 0.9,
                  max_ellipsis_frac: float = 0.3,
                  min_alpha_frac: float = 0.8,
                  min_stopwords: int = 2) -> DataFrame:
    """Keep only documents passing the composed Gopher rules — the gate
    form (scan-stage predicate, stacks with the C4 and quality gates so
    rejected docs never reach the dedup shuffle)."""
    c4 = c4_signals(text_col)
    g = gopher_signals(text_col)
    return df.filter(
        (c4["n_words"] >= min_words) & (c4["n_words"] <= max_words)
        & (c4["mean_word_len"] >= min_mean_word_len)
        & (c4["mean_word_len"] <= max_mean_word_len)
        & (g["symbol_word_ratio"] <= max_symbol_ratio)
        & (g["frac_bullet_lines"] <= max_bullet_frac)
        & (g["frac_ellipsis_lines"] <= max_ellipsis_frac)
        & (g["frac_alpha_words"] >= min_alpha_frac)
        & (g["n_stopwords"] >= min_stopwords))


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", delimiter: str = "\n\n",
                    min_chars: int = 2) -> DataFrame:
    """WITHIN-document duplicate-paragraph removal (the Gopher cleaning
    rule "remove duplicate paragraphs within a document" — repeated
    boilerplate blocks, chorus lines, copy-paste artifacts): split on
    ``delimiter``, keep only the FIRST occurrence of each normalized
    (lowercased, trimmed) paragraph, reassemble in original order.
    Paragraphs shorter than ``min_chars`` after trimming are structural
    (blank separators) and always kept. Complements :func:`line_dedup`,
    which removes segments duplicated ACROSS documents.

    Scale shape: posexplode → per-(doc, key) window keeps rank 1 →
    re-aggregate ordered by position. The only shuffle keys on
    (doc, paragraph-key), so a document's paragraphs spread across the
    cluster and no single task holds more than one document's worth of
    any one paragraph — same discipline as line_dedup.

    Returns ``(doc_id, text, n_paras, n_removed)``."""
    from pyspark.sql import Window

    # F.split's pattern is a Java regex while the DuckDB oracle twin
    # uses literal string_split — quote the delimiter (Pattern.quote
    # semantics: \Q..\E with embedded \E handled) so both engines split
    # on the literal string even when it contains regex metacharacters
    quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), quoted))
         .alias("pos", "para"))
    key = F.lower(F.trim(F.col("para")))
    w = Window.partitionBy("doc_id", key).orderBy("pos")
    flagged = paras.select(
        "doc_id", "pos", "para",
        ((F.length(key) < min_chars)
         | (F.row_number().over(w) == 1)).alias("_keep"))
    return (flagged.groupBy("doc_id")
            .agg(F.concat_ws(
                     delimiter,
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("_keep"),
                                    F.struct("pos", "para")))),
                         lambda s: s["para"])).alias("text"),
                 F.count(F.lit(1)).alias("n_paras"),
                 F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                  .cast("long").alias("n_removed")))
