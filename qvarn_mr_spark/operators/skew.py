"""Skew-handling operators for heavy-hitter keys.

At 100 TB the failure mode isn't logic — it's one reducer holding a key
with 10⁹ rows. Spark already covers two cases for free: map-side partial
aggregation (decomposable aggs never concentrate raw rows) and AQE skew-join
splitting (enabled in session.py, sort-merge joins only). What remains, and
what this module provides:

- :func:`salted_join` — broadcast-free equi-join where the build side is
  small-ish but the probe side has heavy-hitter keys and AQE can't help
  (e.g. the chosen plan is a shuffled hash join, or a streaming foreachBatch
  where AQE is off). Probe rows get a deterministic salt; build rows are
  replicated ``salt`` ways; the hot key's rows spread over ``salt``
  reducers.
- :func:`topk_per_key` — per-key top-k without a single-partition window:
  the naive ``row_number() OVER (PARTITION BY key)`` sends ALL rows of the
  hottest key to one task. Two-phase form: local top-k per (key, salt),
  then top-k over the ≤ salt·k survivors — the heavy key's work spreads
  over ``salt`` tasks and the final pass touches a bounded row count.

Both are pure DataFrame compositions (no UDFs) and deterministic: salts
come from hashing stable columns, never ``rand()`` (retries must not
reshuffle rows between salts mid-job).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from qvarn_mr_spark.session import pin


def _salt_of(cols: list[str], n: int) -> Column:
    """Deterministic salt in [0, n): hash of stable columns. Using data
    columns (not rand) keeps task retries idempotent."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n))


def salted_join(probe: DataFrame, build: DataFrame, key: str,
                salt: int = 16, salt_cols: list[str] | None = None,
                how: str = "inner") -> DataFrame:
    """Equi-join with the probe side's hot keys spread over ``salt``
    reducers.

    ``build`` is replicated ``salt`` ways (explode of a literal range) —
    its shuffle volume multiplies by ``salt``, so use this when
    |build| ≪ |probe| but build is too big to broadcast outright.
    ``salt_cols`` picks the probe columns hashed for the salt (defaults to
    all non-key columns, falling back to the key itself).

    Only probe-preserving joins are supported: replicating the build side
    ``salt`` ways would emit each unmatched build row once per salt value
    under right/full/anti semantics, so those ``how`` values raise."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not probe-preserving; the build "
            f"side is replicated {salt}x, so right/full/anti joins would "
            f"duplicate unmatched build rows. Allowed: {sorted(allowed)}")
    salt_cols = salt_cols or [c for c in probe.columns if c != key] or [key]
    p = probe.withColumn("_salt", _salt_of(salt_cols, salt))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")


def topk_per_key(df: DataFrame, key_cols: list[str], order_col: str,
                 k: int, salt: int = 16,
                 tiebreak: list[str] | None = None,
                 ascending: bool = False) -> DataFrame:
    """Top-k rows per key by ``order_col`` (descending unless
    ``ascending``), skew-safe.

    Phase 1: rank within (key, salt) — the hot key's rows split across
    ``salt`` tasks; keep each shard's top k. Phase 2: rank the ≤ salt·k
    survivors per key. Output equals the naive single-window form (given a
    deterministic ``tiebreak``), with an added ``rn`` rank column."""
    tiebreak = tiebreak or []
    # nulls always LAST on the lead column: F.asc's default is NULLS
    # FIRST, so an undefined score (e.g. NULL cosine from a zero-norm
    # vector, see similarity.cosine) would outrank every real candidate
    # in ascending (distance) rankings. A null score must lose, both ways.
    lead = (F.asc_nulls_last(order_col) if ascending
            else F.desc_nulls_last(order_col))
    order = [lead] + [F.asc(c) for c in tiebreak]
    shard_cols = tiebreak or [order_col]
    salted = df.withColumn("_salt", _salt_of(shard_cols, salt))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order)
    local = (salted.withColumn("_lrn", F.row_number().over(w1))
             .filter(F.col("_lrn") <= k))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (local.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= k)
            .drop("_salt", "_lrn"))


def skew_profile(df: DataFrame, key_cols: list[str],
                 top_n: int = 10) -> DataFrame:
    """Shuffle-key skew diagnostic — the report that decides whether a
    join/agg needs :func:`salted_join` / bucketed windows before it runs
    at scale. One row per statistic:

    ``(stat, key, n_rows)`` with stat ∈ ``top#1..top#N`` (the N hottest
    keys, hot-first, key shown) plus ``p50``/``p90``/``p99``/``max``
    (per-key row-count quantiles), ``n_keys``, and ``skew_ratio``
    (max/mean ×100, as a long — >1000 usually means the hottest key
    serializes its reducer).

    Cost: one map-side-combined hash aggregate on the key over the
    corpus, then statistics over the |keys|-row count table and a
    partial top-N — the diagnostic is as cheap as the cheapest aggregate
    on that key, never heavier than the operator it de-risks."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    # persist the |keys|-sized count table: the top-N branch and the
    # quantile branch otherwise each re-scan and re-aggregate the corpus
    # (union branches don't share the exchange) — with the pin the
    # corpus is read once and both branches read kilobytes
    counts = pin(df.groupBy(key.alias("key"))
                 .agg(F.count(F.lit(1)).alias("n_rows")))
    # rank the ≤ top_n survivors without a window: an unpartitioned
    # row_number() here is bounded (post-limit) but still plans a
    # single-partition WindowExec and warns on every run. The sort-limit
    # compiles to TakeOrderedAndProject (one sorted output partition), so
    # monotonically_increasing_id() over the coalesced result is the
    # contiguous 0..N-1 sequence in rank order.
    top = (counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_n)
           .coalesce(1)
           .select(F.concat(F.lit("top#"),
                            (F.monotonically_increasing_id() + 1)
                            .cast("string"))
                   .alias("stat"),
                   "key", "n_rows"))
    stats = (counts.agg(
        F.expr("percentile(n_rows, 0.5)").alias("p50"),
        F.expr("percentile(n_rows, 0.9)").alias("p90"),
        F.expr("percentile(n_rows, 0.99)").alias("p99"),
        F.max("n_rows").cast("double").alias("max"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
        F.round(F.lit(100.0) * F.max("n_rows") / F.avg("n_rows"), 0)
        .alias("skew_ratio"))
        .selectExpr("stack(6, 'p50', p50, 'p90', p90, 'p99', p99, "
                    "'max', max, 'n_keys', n_keys, "
                    "'skew_ratio', skew_ratio) AS (stat, value)")
        .select("stat", F.lit(None).cast("string").alias("key"),
                F.col("value").cast("long").alias("n_rows")))
    return top.unionByName(stats)
