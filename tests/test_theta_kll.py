"""Theta (set-operation) and KLL (quantile) sketch operators."""

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.functions import sketches


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir, tables=("events",))["events"]


def test_theta_overlap_exact_below_k(spark, events):
    """At test cardinality (≪ k=4096) theta sketches hold the full hash
    sample, so every set-algebra estimate is exactly the true count."""
    users = lambda t: {r["user_id"] for r in events.filter(
        F.col("event_type") == t).select("user_id").distinct().collect()}
    a, b = users("click"), users("purchase")
    got = sketches.theta_overlap(
        sketches.theta_rollup(events, ["event_type"], "user_id"),
        "event_type", "click", "purchase").collect()[0]
    assert got["n_a"] == len(a)
    assert got["n_b"] == len(b)
    assert got["n_union"] == len(a | b)
    assert got["n_intersection"] == len(a & b)
    assert got["n_a_only"] == len(a - b)


def test_kll_merged_quantiles_within_rank_error(spark, events):
    """Quantiles read from merged per-day sketches must sit within the KLL
    rank-error bound of the requested probability (the bound holds for ANY
    distribution, so this is a real contract, not a tuned tolerance)."""
    daily = sketches.kll_rollup(
        events.withColumn("day", F.to_date("ts")), ["day"], "value", k=200)
    out = sketches.kll_quantiles(daily, [], [0.1, 0.5, 0.9]).collect()[0]
    n = events.count()
    eps = 2 * 1.65 / 100  # two-sided @ k=200
    for p in (0.1, 0.5, 0.9):
        v = out[f"q_{str(p).replace('.', '_')}"]
        rank = events.filter(F.col("value") <= v).count() / n
        assert abs(rank - p) <= eps, (p, v, rank)


def test_kll_group_rollup_schema(spark, events):
    daily = sketches.kll_rollup(
        events.withColumn("day", F.to_date("ts")),
        ["day", "event_type"], "value")
    per_type = sketches.kll_quantiles(daily, ["event_type"], [0.5])
    rows = per_type.collect()
    assert {r["event_type"] for r in rows} == \
        {r["event_type"] for r in events.select("event_type")
         .distinct().collect()}
    assert all(r["q_0_5"] is not None for r in rows)


def test_theta_rollup_merge_equals_single_pass(spark, events):
    """Union-merging per-day theta sketches == sketching all rows at once
    (exact below k, like the HLL twin)."""
    daily = sketches.theta_rollup(
        events.withColumn("day", F.to_date("ts")),
        ["day", "event_type"], "user_id")
    rolled = {r["event_type"]: r["distinct_est"] for r in
              sketches.theta_merge(daily, ["event_type"]).collect()}
    exact = {r["event_type"]: r["n"] for r in
             events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert rolled == exact


def test_theta_overlap_missing_segment_reports_zero(spark, events):
    """A segment with no sketch row must not produce an empty result (the
    empty-crossJoin hazard): one row always, zeros for the missing side."""
    sk = sketches.theta_rollup(
        events.filter(F.col("event_type") == "click"),
        ["event_type"], "user_id")
    out = sketches.theta_overlap(sk, "event_type", "click", "nope").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_a"] > 0
    assert r["n_b"] == 0 and r["n_intersection"] == 0
    assert r["n_union"] == r["n_a"] == r["n_a_only"]
    # and the fully-empty case: both sides missing → one all-zero row
    both = sketches.theta_overlap(sk, "event_type", "no1", "no2").collect()
    assert len(both) == 1
    assert all(both[0][c] == 0 for c in
               ("n_a", "n_b", "n_union", "n_intersection", "n_a_only"))
