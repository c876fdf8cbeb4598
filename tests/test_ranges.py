"""Bucketed range join: brute-force differential, bucket-boundary cases,
semi-join dedup, and plan shape (equi-join, never a nested loop)."""

import random

from pyspark.sql import functions as F

from qvarn_mr_spark.operators.ranges import range_join, range_semi_join


def _ts_df(spark, rows, cols):
    """rows carry epoch-seconds ints in ts-ish positions → timestamps."""
    df = spark.createDataFrame(rows, cols)
    for c in cols:
        if c.startswith("t_"):
            df = df.withColumn(c, F.timestamp_micros(F.col(c) * 1_000_000))
    return df


def test_differential_vs_bruteforce(spark):
    rng = random.Random(21)
    pts = [(rng.randrange(3), rng.randrange(10_000), i)
           for i in range(150)]
    ivs = []
    for j in range(60):
        s = rng.randrange(10_000)
        ivs.append((rng.randrange(3), s, s + rng.randrange(0, 1200),
                    1000 + j))
    left = _ts_df(spark, pts, ["k", "t_p", "lid"])
    right = _ts_df(spark, ivs, ["k", "t_s", "t_e", "rid"])
    got = {(r["lid"], r["rid"]) for r in
           range_join(left, right, ["k"], "t_p", "t_s", "t_e",
                      bucket_s=600).collect()}
    want = {(lid, rid)
            for (lk, p, lid) in pts
            for (rk, s, e, rid) in ivs
            if lk == rk and s <= p <= e}
    assert got == want

    semi = {r["lid"] for r in
            range_semi_join(left, right, ["k"], "t_p", "t_s", "t_e",
                            left_id="lid", bucket_s=600).collect()}
    assert semi == {lid for (lid, _) in want}
    # semi output has no duplicate left rows despite overlapping intervals
    cnt = range_semi_join(left, right, ["k"], "t_p", "t_s", "t_e",
                          left_id="lid", bucket_s=600).count()
    assert cnt == len(semi)


def test_bucket_boundaries_inclusive(spark):
    # point exactly on interval start/end and exactly on a bucket edge
    left = _ts_df(spark, [(1, 600, 1), (1, 1200, 2), (1, 1800, 3)],
                  ["k", "t_p", "lid"])
    right = _ts_df(spark, [(1, 600, 1200, 9)], ["k", "t_s", "t_e", "rid"])
    got = {r["lid"] for r in
           range_join(left, right, ["k"], "t_p", "t_s", "t_e",
                      bucket_s=600).collect()}
    assert got == {1, 2}  # inclusive bounds; 1800 outside


def test_plan_is_equi_join(spark):
    left = _ts_df(spark, [(1, 5, 1)], ["k", "t_p", "lid"])
    right = _ts_df(spark, [(1, 0, 10, 9)], ["k", "t_s", "t_e", "rid"])
    plan = (range_join(left, right, ["k"], "t_p", "t_s", "t_e")
            ._jdf.queryExecution().executedPlan().toString())
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan, plan
    assert "Join" in plan
