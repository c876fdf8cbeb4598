"""Event-time operators: gap-based sessionization and tumbling windows.

The reference has no event-time semantics at all (SURVEY §2.7 T10 — "late
data is just the next notification"); these are the standard extensions a
stream/event table needs. Both have exact batch forms (SQL-expressible, so
DuckDB-oracle-checkable) and streaming twins in
``qvarn_mr_spark.streaming.stateful``.

Scale: sessionize is one shuffle (by user) + two window passes over sorted
partitions; the tumbling window is a plain hash aggregate. Skewed users
(bots with millions of events) are the known hazard — AQE skew handling
covers the join case; for the window pass, a pathological single-user
partition would need a two-level (user, day) pre-split, noted inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qvarn_mr_spark.timeutil import ts_us


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``.

    Classic two-window formulation: lag → new-session flag → running sum =
    session index; then one aggregate per (user, session). Both window
    passes share the same (user) partitioning and (ts, id) ordering, so
    Catalyst plans ONE shuffle + one sort for all of it.

    Returns ``(user_id, session_idx, n_events, session_start, session_end,
    duration_s)`` with timestamps formatted as strings for engine-portable
    comparison.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col))
    ts_dt = dict(events.dtypes).get(ts_col)
    us = ts_us(ts_col, ts_dt)
    prev = F.lag(us).over(w)
    new_sess = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    with_idx = events.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (with_idx.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min(ts_col), fmt).alias("session_start"),
                 F.date_format(F.max(ts_col), fmt).alias("session_end"),
                 # floor, not cast: double→int casts truncate in Spark but
                 # round in other engines — floor is unambiguous in both
                 F.floor((ts_us(F.max(ts_col), ts_dt)
                          - ts_us(F.min(ts_col), ts_dt)) / 1_000_000.0)
                 .cast("long").alias("duration_s")))


def sessionize_bucketed(events: DataFrame, gap_minutes: int = 30,
                        bucket_hours: int = 24,
                        user_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Skew-safe :func:`sessionize`: identical output, but a hot user's
    events never sort in one task.

    The plain form's hazard (noted in :func:`sessionize`) is the per-user
    window — one bot with 10⁸ events is one monster sort task. Same remedy
    as :func:`~qvarn_mr_spark.operators.asof.asof_join_bucketed`: work per
    (user, time-bucket), then stitch across bucket boundaries via a
    metadata-sized spine.

    1. shuffle on (user, bucket); LOCAL lag/gap window per bucket gives
       each event a bucket-local session index;
    2. spine = one row per (user, bucket): first/last event time and local
       session count — per-user window over the spine decides whether a
       bucket's first session continues the previous non-empty bucket's
       last session (boundary gap ≤ threshold) and assigns each bucket a
       cumulative global session offset;
    3. join the offset back on (user, bucket) and aggregate per global
       session id — a plain hash aggregate, partial-combined map-side, no
       per-user sort anywhere.

    Exactness: events with equal timestamps land in the same bucket
    ordering, boundary merges use exactly the same gap predicate as the
    local flag, and a chain of single-session buckets keeps collapsing
    because a merged bucket contributes ``n_local - 1`` new sessions to
    the running offset. Differential-tested against :func:`sessionize`
    (including a 50%-of-rows hot user) and oracle-checked against the same
    DuckDB SQL as the plain form.

    Pick ``bucket_hours`` ≫ the session gap (default 24 h vs 30 min) so
    boundary stitches stay rare and buckets stay much larger than
    sessions; the bucket count is the parallelism knob for hot users.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = bucket_hours * 3600 * 1_000_000
    ts_dt = dict(events.dtypes).get(ts_col)
    us = ts_us(ts_col, ts_dt)
    ev = events.withColumn("_us", us).withColumn(
        "_bkt", F.floor(F.col("_us") / F.lit(bucket_us)))

    wl = Window.partitionBy(user_col, "_bkt").orderBy(ts_col, id_col)
    prev = F.lag("_us").over(wl)
    local_new = F.when(
        prev.isNull() | ((F.col("_us") - prev) > gap_us), 1).otherwise(0)
    ev = ev.withColumn(
        "_lidx",
        F.sum(local_new).over(
            wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    # spine: one row per (user, bucket) — metadata-sized next to the data
    spine = (ev.groupBy(user_col, "_bkt")
             .agg(F.min("_us").alias("_first_us"),
                  F.max("_us").alias("_last_us"),
                  F.max("_lidx").alias("_nloc")))
    ws = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_us").over(ws)
    merged = F.when(prev_last.isNotNull()
                    & ((F.col("_first_us") - prev_last) <= gap_us),
                    1).otherwise(0)
    spine = spine.withColumn("_merged", merged).withColumn(
        "_cum",
        F.sum(F.col("_nloc") - F.col("_merged")).over(
            ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    spine = spine.select(
        user_col, "_bkt", "_merged",
        F.lag("_cum", 1, 0).over(ws).alias("_base"))

    stitched = ev.join(spine.select(user_col, "_bkt", "_base", "_merged"),
                       [user_col, "_bkt"])
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (stitched
            .withColumn("session_idx",
                        F.col("_base") + F.col("_lidx") - F.col("_merged"))
            .groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.date_format(F.min(ts_col), fmt).alias("session_start"),
                 F.date_format(F.max(ts_col), fmt).alias("session_end"),
                 F.floor((ts_us(F.max(ts_col), ts_dt)
                          - ts_us(F.min(ts_col), ts_dt)) / 1_000_000.0)
                 .cast("long").alias("duration_s")))


def sessionize_sql(gap_minutes: int = 30, table: str = "events") -> str:
    """DuckDB oracle twin of :func:`sessionize` (generated here so the gap
    constant can never drift between the two)."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
indexed AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0)
            AS BIGINT) AS duration_s
FROM indexed
GROUP BY 1, 2
"""
