"""Range (interval-containment) join — match point rows to interval rows
of the same key with ``start <= point <= end``.

The reference has equi-joins only (SURVEY §2.3); this is the other standard
temporal-join extension (events-in-session, trade-in-outage-window,
reading-in-calibration-period).

Spark-first design — why not the naive predicate join: Catalyst plans
``l.k = r.k AND l.ts BETWEEN r.s AND r.e`` as a join on ``k`` whose every
key group degenerates to a nested loop over the BETWEEN conjunct; with few
distinct keys (or none) that is a Cartesian blowup. The scale-safe shape
is **bucketing**: quantize time into fixed-width buckets, explode each
interval to the buckets it touches, tag each point with its bucket,
equi-join on (key, bucket), then apply the exact BETWEEN as a post-filter.

Cost: the shuffle key becomes (key, bucket) — high cardinality, evenly
spread — and each point row meets only the intervals sharing its bucket,
never the whole key group. Interval replication is
``ceil(len/bucket) + 1`` rows; pick ``bucket_s`` on the order of the
typical interval length (replication ≤ 2×) — the classic overlap-join
binning of genomic/temporal engines.

Output rows are (left row, matched interval payload) pairs — one per
containment, like an inner join. Use :func:`range_semi_join` for the
"keep left rows matching ≥1 interval" flavor (dedup by left id, no pair
explosion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qvarn_mr_spark.timeutil import ts_us


def _us(df: DataFrame, name: str) -> Column:
    # type-aware: unix_micros for tz-aware TIMESTAMP (DST-exact),
    # NTZ wall-clock diff for TIMESTAMP_NTZ (the testdata type) / DATE
    return ts_us(F.col(name), dict(df.dtypes).get(name))


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               left_point: str, right_start: str, right_end: str,
               bucket_s: int = 600,
               payload: dict[str, str] | None = None) -> DataFrame:
    """Inner containment join: every (left row, containing interval) pair.

    ``on``               equality key columns (both sides).
    ``left_point``       timestamp column on ``left``.
    ``right_start/end``  inclusive interval-bound timestamp columns on
                         ``right`` (rows with start > end are dropped).
    ``bucket_s``         bucket width in seconds; choose ≈ the typical
                         interval length.
    ``payload``          {right_column: output_alias}; defaults to all
                         non-key, non-bound right columns.
    """
    if payload is None:
        payload = {c: c for c in right.columns
                   if c not in on and c not in (right_start, right_end)}
    w_us = F.lit(int(bucket_s) * 1_000_000)
    r = right.select(
        *[F.col(k) for k in on],
        _us(right, right_start).alias("_s"),
        _us(right, right_end).alias("_e"),
        *[F.col(c).alias(a) for c, a in payload.items()],
    ).filter(F.col("_s") <= F.col("_e")).withColumn(
        "_b",
        # floor, not integer cast: casts truncate toward zero, which is
        # wrong for pre-1970 (negative-epoch) timestamps
        F.explode(F.sequence(F.floor(F.col("_s") / w_us),
                             F.floor(F.col("_e") / w_us))))
    l = left.withColumn("_p", _us(left, left_point)).withColumn(
        "_b", F.floor(F.col("_p") / w_us))
    out = (l.join(r, on + ["_b"])
           .filter((F.col("_p") >= F.col("_s"))
                   & (F.col("_p") <= F.col("_e"))))
    return out.drop("_b", "_p", "_s", "_e")


def range_semi_join(left: DataFrame, right: DataFrame, on: list[str],
                    left_point: str, right_start: str, right_end: str,
                    left_id: str, bucket_s: int = 600) -> DataFrame:
    """Left rows that fall inside ≥1 interval (EXISTS flavor): the inner
    bucketed join projected to left columns and deduped by ``left_id`` —
    an interval spanning two buckets, or two overlapping intervals, must
    not duplicate a left row."""
    matched = range_join(left, right, on, left_point, right_start,
                         right_end, bucket_s, payload={})
    return (matched.select(*left.columns)
            .dropDuplicates([*on, left_id]))
