"""Mergeable sketch aggregates — the pre-aggregation pattern 100 TB needs.

An exact ``COUNT(DISTINCT x)`` over a huge fact table re-shuffles the raw
values every time someone asks. The scale pattern is to aggregate ONCE
into a mergeable sketch per fine-grained group (day, partition, tenant)
and answer every coarser query by merging sketches — kilobytes per group,
associative, re-aggregatable along any rollup dimension. Spark 4 ships
Apache DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg``
/ ``hll_sketch_estimate``), all JVM-side.

Two properties make this safe to build on (both pinned by tests):

* **merge-exactness** — estimating the union of per-group sketches gives
  EXACTLY the same number as sketching the raw rows in one pass (same
  ``lg_k``): the rollup introduces no additional error;
* **bounded error** — the estimate is within the standard HLL relative
  standard error (≈ 1.04/√2^lg_k; ~1.6 % at the default lg_k=12).

``reduce_hll_distinct`` exposes the sketch as an incrementally
maintainable view through the engine's algebraic merge path: insert-only
dirty keys fold new rows in via ``hll_union`` (O(delta)); keys that lost
rows fall back to full-group recompute — HLL cannot retract, and the
merge/recompute split (operators/incremental.py) is exactly the soundness
rule that needs.

The reference has no approximate aggregates at all (SURVEY §2.4 ends at
sum/min); this module is part of the beyond-reference scale toolkit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default DataSketches HLL precision: 2^12 registers ≈ 1.6 % RSE, 4 KiB.
DEFAULT_LG_K = 12


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               lg_k: int = DEFAULT_LG_K,
               sketch_col: str = "hll") -> DataFrame:
    """One HLL sketch of ``value_col`` per ``group_cols`` group — the
    finest-grained stored rollup. One shuffle, partial-combined map-side
    like any hash aggregate (sketches merge associatively, so the partial
    aggregate IS a sketch merge)."""
    return (df.groupBy(*group_cols)
            .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)))


def hll_merge(sketches: DataFrame, group_cols: list[str],
              sketch_col: str = "hll",
              out_col: str = "distinct_est") -> DataFrame:
    """Re-aggregate stored sketches to a coarser grouping and estimate.

    ``group_cols`` may be any subset of the rollup's dimensions (empty →
    grand total). Input is sketch rows (kilobytes/group), never raw data:
    this is the query 100 TB answers from megabytes.
    """
    merged = F.hll_union_agg(F.col(sketch_col)).alias("_m")
    g = (sketches.groupBy(*group_cols).agg(merged) if group_cols
         else sketches.agg(merged))
    return g.select(
        *group_cols, F.hll_sketch_estimate("_m").alias(out_col))


def distinct_rollup(df: DataFrame, group_cols: list[str], value_col: str,
                    lg_k: int = DEFAULT_LG_K,
                    out_col: str = "distinct_est") -> DataFrame:
    """Sketch-then-estimate in one expression: per-group approximate
    distinct counts with mergeable intermediate state."""
    return hll_merge(hll_rollup(df, group_cols, value_col, lg_k),
                     group_cols, out_col=out_col)


def reduce_hll_distinct(lg_k: int = DEFAULT_LG_K, version: int = 1,
                        alias: str = "_mr_value"):
    """A reduce spec whose stored value is an HLL sketch of the mapped
    values — an approximate-distinct materialized view that maintains
    itself in O(delta) for insert-only batches (``hll_union`` merge) and
    recomputes only groups that lost rows. Read the estimate with
    :func:`estimate`."""
    from qvarn_mr_spark.operators.mapreduce import reduce_agg

    return reduce_agg(
        {alias: lambda c: F.hll_sketch_agg(c, F.lit(lg_k))},
        merge={alias: lambda old, delta: F.hll_union(old, delta)},
        version=version)


def estimate(sketch: Column | str) -> Column:
    """Long estimate from a stored sketch column."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)


# ---------------------------------------------------------------------------
# Theta sketches — distinct counts under SET OPERATIONS
# ---------------------------------------------------------------------------
# HLL answers "how many distinct x per group"; theta sketches additionally
# support intersection and difference between groups' distinct sets — the
# funnel/overlap questions ("users who clicked AND purchased") that are
# brutally expensive exactly (a distinct-distinct join) but kilobyte-cheap
# on sketches. DataSketches theta keeps the actual hash sample until k
# (default 4096) entries, so small-cardinality results are EXACT — which
# also makes them oracle-checkable at test scale.

def theta_rollup(df: DataFrame, group_cols: list[str], value_col: str,
                 sketch_col: str = "theta") -> DataFrame:
    """One theta sketch of ``value_col`` per group — same shape as
    :func:`hll_rollup`, but the stored state supports ∩ and \\ too."""
    return (df.groupBy(*group_cols)
            .agg(F.theta_sketch_agg(value_col).alias(sketch_col)))


def theta_overlap(sketches: DataFrame, segment_col: str, seg_a: str,
                  seg_b: str, sketch_col: str = "theta") -> DataFrame:
    """Distinct-set algebra between two segments' sketches: one row
    ``(n_a, n_b, n_union, n_intersection, n_a_only)``.

    The two single-row sides cross-join (1×1 — no data motion) and all
    five estimates come from the same pair of sketches. At < k distinct
    values per side the numbers are exact; beyond, standard theta error.

    Always returns exactly one row: each side is reduced with
    ``theta_union_agg`` (one row even when the segment has no sketch —
    NULL state), and a missing side reports zero counts instead of
    silently dropping the result (the empty-crossJoin hazard).
    """
    a = (sketches.filter(F.col(segment_col) == seg_a)
         .agg(F.theta_union_agg(F.col(sketch_col)).alias("_a")))
    b = (sketches.filter(F.col(segment_col) == seg_b)
         .agg(F.theta_union_agg(F.col(sketch_col)).alias("_b")))
    _a, _b = F.col("_a"), F.col("_b")
    zero = F.lit(0).cast("long")
    est = F.theta_sketch_estimate
    return a.crossJoin(b).select(
        F.coalesce(est(_a), zero).alias("n_a"),
        F.coalesce(est(_b), zero).alias("n_b"),
        F.when(_a.isNull(), F.coalesce(est(_b), zero))
         .when(_b.isNull(), est(_a))
         .otherwise(est(F.theta_union(_a, _b))).alias("n_union"),
        F.when(_a.isNull() | _b.isNull(), zero)
         .otherwise(est(F.theta_intersection(_a, _b)))
         .alias("n_intersection"),
        F.when(_a.isNull(), zero)
         .when(_b.isNull(), est(_a))
         .otherwise(est(F.theta_difference(_a, _b))).alias("n_a_only"),
    )


def theta_merge(sketches: DataFrame, group_cols: list[str],
                sketch_col: str = "theta",
                out_col: str = "distinct_est") -> DataFrame:
    """Re-aggregate stored theta sketches to a coarser grouping (union
    semantics) and estimate — the theta analogue of :func:`hll_merge`,
    for when the stored rollup must also serve ∩/∖ queries."""
    merged = F.theta_union_agg(F.col(sketch_col)).alias("_m")
    g = (sketches.groupBy(*group_cols).agg(merged) if group_cols
         else sketches.agg(merged))
    return g.select(
        *group_cols, F.theta_sketch_estimate(F.col("_m")).alias(out_col))


# ---------------------------------------------------------------------------
# KLL sketches — mergeable quantiles
# ---------------------------------------------------------------------------
# Exact percentiles over a huge table need a global sort (or a full
# per-group value shuffle); KLL stores a provably-bounded quantile summary
# that merges associatively — per-partition/day/group sketches roll up to
# any coarser grouping, like HLL for distinct. Rank error ≈ 1.65 % at the
# default k=200, bounded by construction (not distribution-dependent).

def kll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 200, sketch_col: str = "kll") -> DataFrame:
    """One KLL(double) sketch of ``value_col`` per group."""
    return (df.groupBy(*group_cols)
            .agg(F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(k))
                .alias(sketch_col)))


def kll_quantiles(sketches: DataFrame, group_cols: list[str],
                  probs: list[float],
                  sketch_col: str = "kll") -> DataFrame:
    """Merge stored KLL sketches to ``group_cols`` granularity and read
    quantiles: output ``(*group_cols, q_<p> ...)`` — one column per
    requested probability.

    Spark exposes KLL merge as a two-sketch scalar
    (``kll_sketch_merge_double``), not an aggregate, so the group's
    sketches are gathered with ``collect_list`` and folded with
    ``F.aggregate`` — safe because the collected values are the SKETCHES
    (bounded kilobytes each), never data rows; a group merging even
    thousands of per-day sketches folds a few MB.
    """
    arr = F.collect_list(F.col(sketch_col)).alias("_arr")
    g = (sketches.groupBy(*group_cols).agg(arr) if group_cols
         else sketches.agg(arr))
    rest = F.slice(F.col("_arr"), 2,
                   F.greatest(F.size(F.col("_arr")) - 1, F.lit(0)))
    merged = F.aggregate(rest, F.element_at(F.col("_arr"), 1),
                         lambda acc, s: F.kll_sketch_merge_double(acc, s))
    g = g.select(*group_cols, merged.alias("_m"))
    cols = [F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(p))
            .alias(f"q_{str(p).replace('.', '_')}") for p in probs]
    return g.select(*group_cols, *cols)


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable heavy-hitter / frequency counts
# ---------------------------------------------------------------------------

#: depth d = number of independent hash rows (error probability ~ exp(-d))
CMS_DEPTH = 4
#: width w = counters per row (overestimate bound ~ e*N/w with prob 1-e^-d)
CMS_WIDTH = 256


def _cms_cols(item: Column, depth: int, width: int) -> Column:
    """Array of ``depth`` counter columns for an item — seeded xxhash64,
    sign-folded into [0, width)."""
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(d), item), F.lit(width))
        for d in range(depth)])


def cms_rollup(df: DataFrame, group_cols: list[str], item_col: str,
               weight_col: str | None = None,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Per-group count-min sketch as a long-form counter table
    ``(group..., cms_row, cms_col, cms_count)``.

    One ``posexplode`` (depth rows per item) + one hash aggregate; the
    shuffle after map-side partials is bounded by ``|groups| * depth *
    width`` counter cells, NOT by the item stream. The long form is the
    point: counters merge by ADDITION, so coarser rollups are a re-group
    ``sum``, and the engine's algebraic IVM path (MERGE_ADD) maintains a
    CMS view with O(delta) work — unlike HLL, deletions work too
    (negative weights), since count-min is linear."""
    w = (F.col(weight_col).cast("long") if weight_col is not None
         else F.lit(1).cast("long"))
    cells = df.select(
        *[F.col(c) for c in group_cols],
        F.posexplode(_cms_cols(F.col(item_col).cast("string"),
                               depth, width)).alias("cms_row", "cms_col"),
        w.alias("_w"))
    return (cells.groupBy(*group_cols, "cms_row", "cms_col")
            .agg(F.sum("_w").alias("cms_count")))


def cms_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge counter tables to a coarser grouping — plain re-group sum
    (count-min is linear: cms(A ∪ B) = cms(A) + cms(B), exactly)."""
    return (sketches.groupBy(*group_cols, "cms_row", "cms_col")
            .agg(F.sum("cms_count").alias("cms_count")))


def cms_estimate(sketches: DataFrame, items: DataFrame, item_col: str,
                 group_cols: list[str] | None = None,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch: per item (x group), the min over its
    ``depth`` counters — ≥ the true count always, ≤ true + εN w.h.p.

    The probe side explodes to ``depth`` rows per queried item and
    equi-joins the counter table on (row, col[, group]) — query-sized,
    never corpus-sized. Missing cells mean a zero counter (left join +
    coalesce), so never-seen items estimate 0."""
    probes = items.select(
        *(group_cols or []),
        F.col(item_col).alias("_item"),
        F.posexplode(_cms_cols(F.col(item_col).cast("string"),
                               depth, width)).alias("cms_row", "cms_col"))
    keys = (group_cols or []) + ["cms_row", "cms_col"]
    joined = (probes.join(sketches, keys, "left")
              .withColumn("cms_count",
                          F.coalesce(F.col("cms_count"), F.lit(0))))
    return (joined.groupBy(*(group_cols or []), "_item")
            .agg(F.min("cms_count").alias("est_count"))
            .withColumnRenamed("_item", item_col))


# ---------------------------------------------------------------------------
# Bloom filter — mergeable membership, the shuffle-pruning prefilter
# ---------------------------------------------------------------------------

#: m = bits in the filter. FP rate ~ (1 - e^(-k*n/m))^k; 2^16 bits / 4
#: hashes holds ~6.5k items at <1 % FP — size m ~ 14.4 * n for 1 e-3.
BLOOM_BITS = 1 << 16
#: k = hash functions per item.
BLOOM_HASHES = 4


def _bloom_positions(item: Column, num_hashes: int,
                     num_bits: int) -> list[Column]:
    """``k`` seeded-xxhash64 bit positions in [0, num_bits). The item is
    cast to string so build and probe sides hash identically regardless
    of the caller's column type."""
    s = item.cast("string")
    return [F.pmod(F.xxhash64(F.lit(0x6B10 + i), s), F.lit(num_bits))
            for i in range(num_hashes)]


def bloom_rollup(df: DataFrame, group_cols: list[str], item_col: str,
                 num_bits: int = BLOOM_BITS,
                 num_hashes: int = BLOOM_HASHES) -> DataFrame:
    """Per-group Bloom filter as a long-form word table
    ``(group..., bloom_word, bloom_mask)`` — only words with set bits are
    materialized (sparse), each a 64-bit mask.

    One explode (``k`` rows per item) + one hash aggregate; the shuffle
    after map-side ``bit_or`` partials is bounded by
    ``|groups| * num_bits/64`` words, not by the item stream. Like the
    CMS, the long form merges by re-group ``bit_or`` (Bloom union is
    bitwise OR, exactly), so coarser rollups never touch raw data."""
    pos = F.explode(F.array(*_bloom_positions(
        F.col(item_col).cast("string"), num_hashes, num_bits))).alias("_p")
    cells = df.select(*[F.col(c) for c in group_cols], pos)
    words = cells.select(
        *[F.col(c) for c in group_cols],
        F.expr("_p div 64").alias("bloom_word"),
        F.expr("shiftleft(1L, cast(_p % 64 as int))").alias("_m"))
    return (words.groupBy(*group_cols, "bloom_word")
            .agg(F.expr("bit_or(_m)").alias("bloom_mask")))


def bloom_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge word tables to a coarser grouping — plain re-group ``bit_or``
    (bloom(A ∪ B) = bloom(A) | bloom(B), exactly)."""
    return (sketches.groupBy(*group_cols, "bloom_word")
            .agg(F.expr("bit_or(bloom_mask)").alias("bloom_mask")))


def bloom_pack(sketch: DataFrame, num_bits: int = BLOOM_BITS) -> DataFrame:
    """Collapse an ungrouped word table into ONE row holding the dense
    ``array<long>`` filter (``num_bits/64`` words) — kilobytes, the shape
    a map-side membership probe broadcasts."""
    n_words = (num_bits + 63) // 64
    m = F.map_from_arrays(F.collect_list("bloom_word"),
                          F.collect_list("bloom_mask"))
    dense = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
        lambda i: F.coalesce(F.element_at(m, i), F.lit(0).cast("long")))
    return sketch.groupBy().agg(dense.alias("bloom"))


def bloom_might_contain(packed: Column, item: Column,
                        num_bits: int = BLOOM_BITS,
                        num_hashes: int = BLOOM_HASHES) -> Column:
    """Map-side membership probe against a packed ``array<long>`` filter:
    true iff all ``k`` bits are set. No false negatives; false positives
    at the filter's design rate. Pure Column expression — after a 1-row
    broadcast of the packed filter this runs inside the scan stage."""
    out = F.lit(True)
    for p in _bloom_positions(item, num_hashes, num_bits):
        word = F.element_at(packed,
                            (F.floor(p / F.lit(64)) + 1).cast("int"))
        out = out & (F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return out


#: 64 single-bit long masks (index b+1 = bit b; bit 63 is the sign bit).
_BIT_MASKS = [1 << b for b in range(63)] + [-(1 << 63)]


def _row_bloom_words(item: Column, num_bits: int,
                     num_hashes: int) -> Column:
    """One row's Bloom contribution as a dense ``array<long>`` of
    ``num_bits/64`` words with the item's ``k`` bits set — built from a
    literal mask LUT + ``element_at`` (Spark's ``shiftleft`` only takes a
    literal shift), all JVM-side."""
    n_words = num_bits // 64
    masks = F.lit(_BIT_MASKS)
    pos = F.array(*_bloom_positions(item, num_hashes, num_bits))
    def word_fold(w: int):
        # bind w in a closure, NOT a lambda default — PySpark reads the
        # lambda's parameter count to pick the higher-order-function
        # arity, and a default parameter would make this look 3-ary
        def fold(acc: Column, p: Column) -> Column:
            return acc.bitwiseOR(
                F.when(F.floor(p / F.lit(64)) == w,
                       F.element_at(masks,
                                    F.pmod(p, F.lit(64)).cast("int") + 1))
                .otherwise(F.lit(0).cast("long")))
        return F.aggregate(pos, F.lit(0).cast("long"), fold)

    return F.array(*[word_fold(w) for w in range(n_words)])


#: membership-view default: 1024 bits/group ≈ 70 items at <1 % FP, 128 B.
VIEW_BLOOM_BITS = 1024


def reduce_bloom_membership(num_bits: int = VIEW_BLOOM_BITS,
                            num_hashes: int = BLOOM_HASHES,
                            version: int = 1, alias: str = "_mr_value"):
    """A reduce spec whose stored value is a packed per-group Bloom
    filter of the mapped values — a maintained MEMBERSHIP view ("have we
    ever seen x in group g") that the algebraic IVM path updates in
    O(delta) for insert-only batches (bitwise-OR merge, exact: Bloom
    union is OR) and recomputes only for groups that lost rows (bits
    cannot retract, same soundness split as HLL).

    Probe the stored value with :func:`bloom_might_contain` (the packed
    layout is identical) — no false negatives ever, false positives at
    the design rate. This is the streaming-decontamination /
    already-ingested?-shape: the view stays kilobytes per group while
    the item stream is unbounded."""
    from qvarn_mr_spark.operators.mapreduce import reduce_agg

    n_words = num_bits // 64

    def agg_fn(c: Column) -> Column:
        words = _row_bloom_words(c, num_bits, num_hashes)
        return F.array(*[F.bit_or(F.get(words, w))
                         for w in range(n_words)])

    return reduce_agg(
        {alias: agg_fn},
        merge={alias: lambda old, delta: F.zip_with(
            old, delta, lambda a, b: a.bitwiseOR(b))},
        version=version)
