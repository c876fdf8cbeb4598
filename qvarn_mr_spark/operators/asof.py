"""As-of (temporal nearest) join — match each left row to the latest right
row at-or-before its timestamp (or earliest at-or-after, ``direction=
'forward'``) within equal join keys.

The reference has no temporal joins (its only join predicate anywhere is
key/id equality — SURVEY §2.3); this is the standard extension an event
table needs (price-as-of-trade, last-purchase-before-click, config-active-
at-event).

Spark-first design — why not a range join: the naive formulation
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + max-per-row is a
BroadcastNestedLoop or an exploding inner join (every left row pairs with
ALL earlier right rows — O(n·m) per key before the aggregate). Instead we
use the union-and-window formulation:

1. union left and right rows into one stream, tagged by side, with right
   payload packed into one struct column (null on left rows);
2. one shuffle: partition by join keys, sort by (ts, side-order, tiebreak);
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding running
   window assigns each left row the most recent right payload;
4. keep left rows, unpack the struct.

Cost: ONE shuffle of |L|+|R| rows and one sort per key partition — the same
complexity as any window aggregate, independent of time-match fan-in. This
is also how production as-of engines (kdb, QuestDB, DuckDB's ASOF) execute:
a per-key merge over time-sorted runs.

Skew note (100 TB): a heavy-hitter key sorts in a single task. Unlike
top-k, an as-of match needs the full per-key ordering, so salting can't be
applied blindly; the scale remedy is :func:`asof_join_bucketed` —
range-bucket time within keys, match locally per (key, time-bucket), and
carry the last payload across bucket boundaries via a second pass over
per-bucket tails (one row per key×bucket — metadata-sized next to the
data). A year of events at 1-hour buckets turns one monster sort task
into ~9k independent tasks per hot key.

Determinism: Spark windows have no implicit row order, so ties on
(key, ts) between right rows are broken by ``tiebreak`` columns
(ascending; the LAST one in that order wins — i.e. max tiebreak). Pass a
unique column (an id) for reproducible output; this mirrors deduping the
right side to one row per (key, ts) with max-id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qvarn_mr_spark.timeutil import ts_us


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload: dict[str, str] | None = None,
              direction: str = "backward",
              allow_exact_matches: bool = True,
              tiebreak: list[str] | None = None,
              tolerance_us: int | None = None) -> DataFrame:
    """Left as-of join: every left row, plus the matched right payload
    columns (null when no right row qualifies).

    ``on``         equality key columns (both sides).
    ``payload``    {right_column: output_alias} taken from the matched right
                   row; defaults to all non-key, non-ts right columns with
                   their own names.
    ``direction``  'backward' (latest right.ts <= left.ts, the default) or
                   'forward' (earliest right.ts >= left.ts).
    ``allow_exact_matches``  whether right.ts == left.ts may match.
    ``tiebreak``   right columns ordering ties on (key, ts) — last wins.
    ``tolerance_us``  pandas-merge_asof-style maximum event-time distance
                   (µs): a match farther than this reports null payload.
                   Implemented by carrying the matched timestamp through
                   the window — the plan gains one comparison, no pass.
    """
    l2, r2, payload = _prep_sides(left, right, on, left_ts, right_ts,
                                  payload, direction, allow_exact_matches,
                                  tiebreak, with_mts=tolerance_us is not None)
    ts_sort = F.asc("_ts") if direction == "backward" else F.desc("_ts")
    w = (Window.partitionBy(*on)
         .orderBy(ts_sort, F.asc("_ord"), F.asc("_tb"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l2.unionByName(r2)
               .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
               .filter(F.col("_lrow").isNotNull()))
    return matched.select(
        "_lrow.*",
        *_payload_cols(matched, payload, tolerance_us))


def _ts_num(col_name: str, dtype: str):
    """Comparable long for tolerance math: epoch-µs for time types, the
    raw value for numeric ts columns (tolerance then uses native units)."""
    if dtype.startswith(("timestamp", "date")):
        return ts_us(col_name, dtype)
    return F.col(col_name).cast("long")


def _payload_cols(matched, payload, tolerance_us):
    """Output payload columns, nulled when the match is farther than the
    tolerance (the left timestamp is the row's own ``_ts``)."""
    if tolerance_us is None:
        return [F.col(f"_m.{a}").alias(a) for a in payload.values()]
    lts = _ts_num("_ts", dict(matched.dtypes)["_ts"])
    within = F.abs(lts - F.col("_m._mts")) <= F.lit(int(tolerance_us))
    return [F.when(within, F.col(f"_m.{a}")).alias(a)
            for a in payload.values()]


def _prep_sides(left, right, on, left_ts, right_ts, payload, direction,
                allow_exact_matches, tiebreak, with_mts=False):
    """Tag-and-pack both sides for the union-and-window formulation:
    (keys, _ts, _ord, _tb, _lrow, _rpay) with matching schemas. With
    ``with_mts`` the matched right timestamp rides inside the payload
    struct as epoch-µs ``_mts`` (reserved name) for tolerance checks."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    if payload is None:
        payload = {c: c for c in right.columns
                   if c not in on and c != right_ts}
    if with_mts and "_mts" in payload.values():
        raise ValueError("payload alias '_mts' is reserved")
    tiebreak = tiebreak or []

    pay_cols = [F.col(c).alias(a) for c, a in payload.items()]
    if with_mts:
        pay_cols.append(
            _ts_num(right_ts, dict(right.dtypes)[right_ts]).alias("_mts"))
    rpay = F.struct(*pay_cols)
    rpay_type = right.select(rpay.alias("p")).schema["p"].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns])
    lrow_type = left.select(lrow.alias("r")).schema["r"].dataType

    # side-order at equal ts: for inclusive matches the right row must sort
    # BEFORE the left row that may consume it; exclusive flips that.
    r_ord, l_ord = (0, 1) if allow_exact_matches else (1, 0)
    if tiebreak:
        tb_type = right.select(
            F.struct(*[F.col(c) for c in tiebreak]).alias("t")
        ).schema["t"].dataType
        r_tb = F.struct(*[F.col(c) for c in tiebreak]).cast(tb_type)
    else:
        tb_type, r_tb = "bigint", F.lit(0)

    l2 = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).alias("_ts"),
        F.lit(l_ord).alias("_ord"),
        F.lit(None).cast(tb_type).alias("_tb"),
        lrow.alias("_lrow"),
        F.lit(None).cast(rpay_type).alias("_rpay"),
    )
    r2 = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(r_ord).alias("_ord"),
        r_tb.alias("_tb"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        rpay.alias("_rpay"),
    )
    return l2, r2, payload


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: list[str],
                       bucket_width: float,
                       left_ts: str = "ts", right_ts: str = "ts",
                       payload: dict[str, str] | None = None,
                       direction: str = "backward",
                       allow_exact_matches: bool = True,
                       tiebreak: list[str] | None = None,
                       tolerance_us: int | None = None) -> DataFrame:
    """Skew-safe :func:`asof_join`: identical output, but a hot key never
    sorts in one task.

    ``bucket_width`` is in the timestamp's units (seconds for timestamps);
    rows are range-bucketed by ``floor(ts / width)`` and the union-window
    match runs per (key, time-bucket) — a year of one key's events at 1 h
    buckets is ~9k independent tasks instead of one. Rows near a bucket's
    start that need an earlier bucket's right row get it from the carry
    pass: per (key, bucket) keep only the LAST right payload in match
    order (one row per key×bucket — tiny next to the data), run the same
    running-last window over that spine per key, and join the carried
    payload back on (key, bucket).

    Exactness is preserved because equal timestamps always land in the
    same bucket, so the inclusive/exclusive side-ordering logic stays
    entirely inside the local window; carried payloads are strictly from
    earlier buckets, i.e. strictly earlier timestamps.

    Cost: one shuffle of |L|+|R| on (key, bucket), one tiny shuffle of the
    spine on key, one (key, bucket) join — vs one shuffle on key for the
    plain form. Use the plain form unless keys are skewed.
    """
    l2, r2, payload = _prep_sides(left, right, on, left_ts, right_ts,
                                  payload, direction, allow_exact_matches,
                                  tiebreak, with_mts=tolerance_us is not None)
    if direction == "backward":
        ts_sort = [F.asc("_ts"), F.asc("_ord"), F.asc("_tb")]
        ts_rev = [F.desc("_ts"), F.desc("_ord"), F.desc("_tb")]
        bkt_sort = F.asc("_bkt")
    else:
        ts_sort = [F.desc("_ts"), F.asc("_ord"), F.asc("_tb")]
        ts_rev = [F.asc("_ts"), F.desc("_ord"), F.desc("_tb")]
        bkt_sort = F.desc("_bkt")

    u = l2.unionByName(r2)
    # timestamps bucket on tz-free epoch seconds (TIMESTAMP_NTZ can't cast
    # to double, and going through a tz-typed cast would move bucket edges
    # under non-UTC sessions); numeric ts columns bucket on their raw value
    if dict(u.dtypes)["_ts"].startswith(("timestamp", "date")):
        secs = ts_us("_ts", dict(u.dtypes)["_ts"]) / F.lit(1_000_000.0)
    else:
        secs = F.col("_ts").cast("double")
    u = u.withColumn("_bkt", F.floor(secs / F.lit(float(bucket_width))))
    wl = (Window.partitionBy(*on, "_bkt").orderBy(*ts_sort)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_m_local", F.last("_rpay", ignorenulls=True).over(wl))

    # per-bucket tail: the right row a later bucket would inherit = the
    # last right row of this bucket in match order (row 1 of the reverse)
    wt = Window.partitionBy(*on, "_bkt").orderBy(*ts_rev)
    tails = (u.filter(F.col("_rpay").isNotNull())
             .withColumn("_rn", F.row_number().over(wt))
             .filter(F.col("_rn") == 1)
             .select(*on, "_bkt", F.col("_rpay").alias("_tail")))

    # spine: every (key, bucket) seen on either side; carry-in = last tail
    # among strictly earlier buckets (unbounded-preceding, -1). One row per
    # key×bucket, so the per-key window here is metadata-sized.
    spine = (u.select(*on, "_bkt").distinct()
             .join(tails, [*on, "_bkt"], "left"))
    wc = (Window.partitionBy(*on).orderBy(bkt_sort)
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (spine
             .withColumn("_carry", F.last("_tail", ignorenulls=True).over(wc))
             .select(*on, "_bkt", "_carry"))

    lefts = u.filter(F.col("_lrow").isNotNull()).alias("L")
    carry = carry.alias("C")
    cond = F.col("L._bkt") == F.col("C._bkt")
    for k in on:
        # null-safe: the window form groups null keys together
        cond = cond & F.col(f"L.{k}").eqNullSafe(F.col(f"C.{k}"))
    matched = (lefts.join(carry, cond, "left")
               .withColumn("_m", F.coalesce("L._m_local", "C._carry")))
    return matched.select(
        "_lrow.*",
        *_payload_cols(matched, payload, tolerance_us))
