"""Bucketed materialization (sources/bucketed.py): the write-once /
join-forever-free contract.

The value tests prove layout independence (bucketed results == plain
results); the plan tests prove the point of the layout — a join of two
tables bucketed+sorted on the join key has ZERO Exchange and ZERO Sort,
and a groupBy on the bucket key has ZERO Exchange. That is the physical
contract that survives a 1000-executor cluster: the shuffle is paid once
at write time, never again.
"""

import os

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.sources import bucketed as B


@pytest.fixture(scope="module")
def pair(spark, sf_dir):
    t = load_tables(spark, sf_dir, tables=("orders", "customer"))
    o, c = B.bucketed_pair(t["orders"], t["customer"],
                           "o_custkey", "c_custkey", 4, "test_oc")
    return t, o, c


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_no_exchange_no_sort(pair, no_broadcast):
    _, o, c = pair
    j = o.join(c, o.o_custkey == c.c_custkey)
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Sort [" not in plan          # sortBy metadata trusted (1 file/bucket)
    assert "Bucketed: true" in plan


def test_bucketed_groupby_no_exchange(pair):
    _, o, _ = pair
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(agg)


def test_bucketed_values_match_plain(pair, no_broadcast):
    t, o, c = pair
    bucketed = (o.join(c, o.o_custkey == c.c_custkey)
                 .groupBy("c_mktsegment")
                 .agg(F.count("*").alias("n"),
                      F.round(F.sum("o_totalprice"), 2).alias("tp")))
    plain = (t["orders"].join(t["customer"],
                              F.col("o_custkey") == F.col("c_custkey"))
              .groupBy("c_mktsegment")
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("o_totalprice"), 2).alias("tp")))
    assert sorted(map(tuple, bucketed.collect())) == \
        sorted(map(tuple, plain.collect()))


def test_one_file_per_bucket(pair, spark):
    loc = spark.catalog.getDatabase(B.DEFAULT_DB).locationUri
    root = loc[len("file:"):]
    for tname in ("test_oc_l", "test_oc_r"):
        files = [f for f in os.listdir(os.path.join(root, tname))
                 if f.endswith(".parquet")]
        assert len(files) == 4, f"{tname}: {files}"


def test_materialize_idempotent_and_stale_dir_reclaim(pair, spark, sf_dir):
    t, _, _ = pair
    # same-session second call: no rewrite (tableExists fast path)
    fq = B.materialize_bucketed(t["customer"], "test_oc_r",
                                ("c_custkey",), 4)
    assert spark.table(fq).count() == t["customer"].count()
    # simulate a fresh session finding a stale dir: drop from the catalog
    # (which clears the managed location), then plant a leftover dir the
    # way a dead session would leave one — the managed write refuses to
    # reuse an existing location unless materialize reclaims it
    spark.sql("DROP TABLE qvarn_bucketed.test_oc_r")
    loc = spark.catalog.getDatabase(B.DEFAULT_DB).locationUri
    stale = os.path.join(loc[len("file:"):], "test_oc_r")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "leftover"), "w") as f:
        f.write("x")
    fq = B.materialize_bucketed(t["customer"], "test_oc_r",
                                ("c_custkey",), 4)
    assert spark.table(fq).count() == t["customer"].count()
