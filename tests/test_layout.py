"""Skew operators and sink layout: salted joins / two-phase top-k match
their naive forms; partition pruning and shuffle-free bucketed joins show
up in the physical plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.operators.skew import salted_join, topk_per_key
from qvarn_mr_spark.plans import count_exchanges, explain_str
from qvarn_mr_spark.sources.writers import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir, tables=("events",))["events"]


def test_salted_join_matches_plain_join(spark, events):
    users = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n")))
    plain = events.join(users, "user_id").select("event_id", "n")
    salted = salted_join(events, users, "user_id", salt=8) \
        .select("event_id", "n")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_build_preserving_how(spark, events):
    users = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    for how in ("right", "full", "left_anti", "full_outer"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(events, users, "user_id", salt=8, how=how)


def test_topk_per_key_matches_naive_window(events):
    naive_w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id"))
    naive = (events.withColumn("rn", F.row_number().over(naive_w))
             .filter(F.col("rn") <= 5)
             .select("event_type", "event_id", "rn"))
    fast = topk_per_key(events, ["event_type"], "value", k=5, salt=8,
                        tiebreak=["event_id"]) \
        .select("event_type", "event_id", "rn")
    assert sorted(map(tuple, naive.collect())) == \
        sorted(map(tuple, fast.collect()))


def test_partition_pruning_reaches_scan(spark, events, tmp_path):
    path = str(tmp_path / "ev_part")
    write_partitioned(events, path, ["event_type"])
    df = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    txt = explain_str(df, "formatted")
    assert "PartitionFilters: [isnotnull(event_type" in txt
    got = df.count()
    want = events.filter("event_type = 'click'").count()
    assert got == want > 0


def test_bucketed_join_no_shuffle(spark, events, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    agg = events.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("tv"))
    cnt = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    write_bucketed(agg, "ev_tv", ["user_id"], num_buckets=4,
                   sort_by=["user_id"])
    write_bucketed(cnt, "ev_cnt", ["user_id"], num_buckets=4,
                   sort_by=["user_id"])
    joined = spark.table("ev_tv").join(spark.table("ev_cnt"), "user_id")
    # co-located: both sides pre-bucketed on the join key → zero exchanges
    assert count_exchanges(joined) == 0
    assert joined.count() == agg.count()
