"""Session-timezone independence of temporal operators.

Regression guard for the round-2 failure class: the testdata stores
timestamps as parquet TIMESTAMP ``isAdjustedToUTC=0`` (→ TIMESTAMP_NTZ),
and any operator that routes epoch math or date-window literals through
tz-typed casts silently moves rows near window/bucket edges when
``spark.sql.session.timeZone`` is not UTC (the shift differs across DST
boundaries). Every temporal operator must produce byte-identical results
under any session timezone — that is what makes the DuckDB naive-TIMESTAMP
oracle comparison sound no matter how the driver configures its session.

``spark.sql.session.timeZone`` is runtime-settable, so we flip it around
each collect and compare sorted rows.
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# America/New_York has DST transitions inside the data's date ranges, and
# a non-zero base offset — the worst case for wall-clock re-interpretation.
ALT_TZ = "America/New_York"

# Every queries() entry that touches a timestamp column or literal.
TEMPORAL_QUERIES = [
    "events_sessionize",
    "events_sessionize_bucketed",
    "events_distinct_users_hll",
    # price_quantiles_kll is excluded: KLL compaction is randomized, so
    # even two same-timezone runs differ within the rank-error bound —
    # exact equality is the wrong contract (tests/test_theta_kll.py pins
    # the right one)
    "events_hourly",
    "events_asof",
    "events_asof_bucketed",
    "events_error_window",
    "events_running",
    "events_top_users",
    "window_latest",
    "q4_late_orders",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q20_heavy_shippers",
]


def _rows(spark, name, tz):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        df = entry.queries()[name](spark, SF)
        cols = sorted(df.columns)
        return sorted(
            tuple(r) for r in df.select(*cols).collect()
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


@pytest.mark.parametrize("name", TEMPORAL_QUERIES)
def test_query_is_session_timezone_independent(spark, name):
    utc = _rows(spark, name, "UTC")
    alt = _rows(spark, name, ALT_TZ)
    assert utc == alt, f"{name} drifts under session tz {ALT_TZ}"
    # q20's per-supplier quantity threshold has no qualifying rows at the
    # tiny sf; the tz-equality above is still meaningful on its inputs.
    if name != "q20_heavy_shippers":
        assert len(utc) > 0, f"{name} returned no rows at {SF}"


def test_ts_us_matches_duckdb_epoch_semantics(spark):
    """ts_us on an NTZ value equals DuckDB epoch_us on the same naive
    timestamp — the invariant the oracle comparison rests on."""
    import duckdb

    from qvarn_mr_spark.timeutil import ts_lit, ts_us

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", ALT_TZ)
    try:
        wall = "1996-07-01 02:03:04.500000"
        got = (
            spark.range(1)
            .select(ts_us(ts_lit(wall)).alias("us"))
            .collect()[0]["us"]
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    want = duckdb.sql(f"select epoch_us(TIMESTAMP '{wall}')").fetchone()[0]
    assert got == want


def test_ts_us_exact_for_tz_aware_across_dst(spark):
    """For tz-aware TIMESTAMP columns ts_us must use instant micros
    (unix_micros), not a session-tz wall-clock cast: across the US
    spring-forward the wall-clock diff of these two instants is 90 min,
    the true difference 30 min."""
    from qvarn_mr_spark.timeutil import ts_us

    t0, t1 = 1615703400, 1615705200     # 06:30 / 07:00 UTC, 2021-03-14
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", ALT_TZ)
    try:
        df = spark.range(1).select(
            F.timestamp_seconds(F.lit(t0)).alias("a"),
            F.timestamp_seconds(F.lit(t1)).alias("b"))
        dt = dict(df.dtypes)["a"]
        assert dt == "timestamp"
        got = df.select((ts_us("b", dt) - ts_us("a", dt)).alias("d")) \
                .collect()[0]["d"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert got == 1_800_000_000


def test_sessionize_tz_aware_dst_exact(spark):
    """sessionize on a tz-aware events frame: two events exactly one
    30-min gap apart across the DST jump stay ONE session (the wall-clock
    path would read the gap as 90 min and split)."""
    from qvarn_mr_spark.operators.sessions import (sessionize,
                                                   sessionize_bucketed)

    t0, t1 = 1615703400, 1615705200
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", ALT_TZ)
    try:
        df = (spark.createDataFrame([(1, t0, 10), (1, t1, 11)],
                                    "user_id long, sec long, event_id long")
              .select("user_id", "event_id",
                      F.timestamp_seconds(F.col("sec")).alias("ts")))
        assert dict(df.dtypes)["ts"] == "timestamp"
        for fn in (sessionize, sessionize_bucketed):
            rows = fn(df, gap_minutes=30).collect()
            assert len(rows) == 1, f"{fn.__name__} split across DST"
            assert rows[0]["n_events"] == 2
            assert rows[0]["duration_s"] == 1800
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
