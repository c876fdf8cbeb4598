"""sessionize_bucketed == sessionize, including skew and boundary cases.

The bucketed form must be output-identical to the plain per-user window
form for any bucket width — sessions that span bucket boundaries (and
chains of single-session buckets) are the hard part, so the fixtures force
them deliberately.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.operators.sessions import sessionize, sessionize_bucketed


def _eq(a, b):
    ka = sorted(map(tuple, a.select(*sorted(a.columns)).collect()))
    kb = sorted(map(tuple, b.select(*sorted(b.columns)).collect()))
    assert ka == kb


def test_bucketed_matches_plain_on_testdata(spark, sf_dir):
    ev = load_tables(spark, sf_dir, tables=("events",))["events"]
    for hours in (6, 24):
        _eq(sessionize(ev, gap_minutes=30),
            sessionize_bucketed(ev, gap_minutes=30, bucket_hours=hours))


def test_bucketed_matches_plain_on_hot_user(spark):
    """One user owns half the rows; sessions deliberately straddle bucket
    edges: events every 10 min for days (one giant session with 1-hour
    buckets → a long merge chain), plus isolated events."""
    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    # hot user: 3 days of events every 50 min => gaps < 60-min threshold,
    # one session spanning ~72 one-hour buckets
    for i in range(86):
        rows.append((eid, 1, base + timedelta(minutes=50 * i)))
        eid += 1
    # the same hot user: a burst far later (new session)
    for i in range(5):
        rows.append((eid, 1, base + timedelta(days=30, minutes=20 * i)))
        eid += 1
    # cold users: single events, some at exact bucket boundaries
    for u in range(2, 12):
        rows.append((eid, u, base + timedelta(hours=u)))
        eid += 1
        rows.append((eid, u, base + timedelta(hours=u, minutes=59)))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz")
    plain = sessionize(ev, gap_minutes=60)
    bucketed = sessionize_bucketed(ev, gap_minutes=60, bucket_hours=1)
    _eq(plain, bucketed)
    # sanity on the fixture itself: the hot user really has 2 sessions
    hot = plain.filter(F.col("user_id") == 1).count()
    assert hot == 2


def test_boundary_gap_exactly_threshold_merges(spark):
    """gap == threshold must merge across a bucket edge (<= semantics,
    matching the plain form and the DuckDB oracle)."""
    base = datetime(2024, 1, 1, 0, 59)
    ev = spark.createDataFrame(
        [(1, 1, base), (2, 1, base + timedelta(minutes=30))],
        "event_id long, user_id long, ts timestamp_ntz")
    out = sessionize_bucketed(ev, gap_minutes=30, bucket_hours=1).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2

    just_over = spark.createDataFrame(
        [(1, 1, base), (2, 1, base + timedelta(minutes=30, seconds=1))],
        "event_id long, user_id long, ts timestamp_ntz")
    out = sessionize_bucketed(just_over, gap_minutes=30,
                              bucket_hours=1).collect()
    assert len(out) == 2


def test_skew_profile_stats_and_hot_keys(spark):
    from qvarn_mr_spark.operators.skew import skew_profile
    from pyspark.sql import functions as F
    rows = ([("hot", i) for i in range(90)] +
            [("warm", i) for i in range(8)] +
            [(f"cold{j}", 0) for j in range(2)])
    df = spark.createDataFrame(rows, "k string, v long")
    got = {(r["stat"]): (r["key"], r["n_rows"])
           for r in skew_profile(df, ["k"], top_n=2).collect()}
    assert got["top#1"] == ("hot", 90)
    assert got["top#2"] == ("warm", 8)
    assert got["n_keys"] == (None, 4)
    assert got["max"] == (None, 90)
    # mean = 100/4 = 25 -> ratio*100 = 360
    assert got["skew_ratio"] == (None, 360)
    assert "p50" in got and "p99" in got
