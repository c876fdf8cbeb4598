"""HLL sketch rollups: merge-exactness, error bounds, and the
sketch-backed incrementally-maintained distinct view."""

import math

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import Catalog, load_tables
from qvarn_mr_spark.functions import sketches
from qvarn_mr_spark.operators import (
    IncrementalEngine,
    ParquetStateStore,
    ViewEngine,
    map_item,
)
from qvarn_mr_spark.operators.incremental import notifications


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir, tables=("events",))["events"]


def test_rollup_merge_equals_single_pass(spark, events):
    """Estimating the union of per-day sketches == sketching all raw rows
    at once: the rollup adds zero error on top of the sketch itself."""
    daily = sketches.hll_rollup(
        events.withColumn("day", F.to_date("ts")),
        ["day", "event_type"], "user_id")
    via_rollup = sketches.hll_merge(daily, ["event_type"])
    direct = sketches.distinct_rollup(events, ["event_type"], "user_id")
    a = {r["event_type"]: r["distinct_est"] for r in via_rollup.collect()}
    b = {r["event_type"]: r["distinct_est"] for r in direct.collect()}
    assert a == b

    # grand total through two levels of merge
    total_rolled = sketches.hll_merge(daily, []).collect()[0]["distinct_est"]
    total_direct = sketches.distinct_rollup(events, [], "user_id") \
        .collect()[0]["distinct_est"]
    assert total_rolled == total_direct


def test_estimate_within_hll_error_bound(spark, events):
    exact = events.select("user_id").distinct().count()
    est = sketches.distinct_rollup(events, [], "user_id") \
        .collect()[0]["distinct_est"]
    rse = 1.04 / math.sqrt(2 ** sketches.DEFAULT_LG_K)
    assert abs(est - exact) / exact <= 4 * rse, (est, exact)


def test_hll_view_maintains_incrementally(spark, tmp_path):
    """The sketch view through the algebraic merge path: insert-only
    batches union sketches in O(delta); a delete falls back to recompute
    (HLL cannot retract) and still lands on the exact-recompute answer."""
    cat = Catalog(spark)
    rows = [(str(i), i % 3, f"u{i % 40}") for i in range(200)]

    def set_source(rs):
        cat.register("source", spark.createDataFrame(
            rs, "id string, key long, value string"))

    set_source(rows)
    eng = ViewEngine(cat, {
        "m": {"source": map_item("key", "value")},
        "v": {"m": sketches.reduce_hll_distinct()},
    }, id_cols={"source": "id"})
    inc = IncrementalEngine(eng, ParquetStateStore(spark, str(tmp_path / "s")))
    inc.apply_changes(notifications(
        spark, [("source", "created", str(i)) for i in range(200)]))

    def estimates():
        return {r["_mr_key"]: r["e"] for r in inc.read("v").select(
            "_mr_key", sketches.estimate("_mr_value").alias("e")).collect()}

    def exact():
        out = {}
        for _id, key, value in rows:
            out.setdefault(str(key), set()).add(value)
        return {k: len(v) for k, v in out.items()}

    assert estimates() == exact()  # 40 distinct « 2^12 registers: exact

    # insert-only growth → merge path (delta-sized reduce input)
    seen = []
    orig = eng.reduce_table

    def spy(target, map_df=None):
        if map_df is not None:
            seen.append(map_df.count())
        return orig(target, map_df)

    eng.reduce_table = spy
    rows += [("n1", 0, "u99"), ("n2", 0, "u100")]
    set_source(rows)
    inc.apply_changes(notifications(spark, [
        ("source", "created", "n1"), ("source", "created", "n2")]))
    eng.reduce_table = orig
    assert max(seen) <= 2, f"sketch view rescanned a group: {seen}"
    assert estimates() == exact()

    # delete a row whose value appears once in its group → recompute path
    rows = [r for r in rows if r[0] != "n1"]
    set_source(rows)
    inc.apply_changes(notifications(spark, [("source", "deleted", "n1")]))
    assert estimates() == exact()


@pytest.mark.sweep
def test_bloom_view_maintains_incrementally(spark, tmp_path):
    """The membership view through the algebraic merge path: insert-only
    batches OR the bit words in O(delta); a delete falls back to
    recompute (bits cannot retract). No false negatives at every stage;
    a fixed absent probe stays negative (deterministic hashing)."""
    from pyspark.sql import functions as F

    cat = Catalog(spark)
    rows = [(str(i), i % 3, f"u{i % 40}") for i in range(200)]

    def set_source(rs):
        cat.register("source", spark.createDataFrame(
            rs, "id string, key long, value string"))

    set_source(rows)
    eng = ViewEngine(cat, {
        "m": {"source": map_item("key", "value")},
        "v": {"m": sketches.reduce_bloom_membership()},
    }, id_cols={"source": "id"})
    inc = IncrementalEngine(eng, ParquetStateStore(spark, str(tmp_path / "s")))
    inc.apply_changes(notifications(
        spark, [("source", "created", str(i)) for i in range(200)]))

    def probe(value):
        """_mr_key -> might_contain(value) over the stored view."""
        return {r["_mr_key"]: r["hit"] for r in inc.read("v").select(
            "_mr_key",
            sketches.bloom_might_contain(
                F.col("_mr_value"), F.lit(value),
                sketches.VIEW_BLOOM_BITS).alias("hit")).collect()}

    def members():
        out = {}
        for _id, key, value in rows:
            out.setdefault(str(key), set()).add(value)
        return out

    def assert_no_false_negatives():
        mem = members()
        for v in {val for vals in mem.values() for val in vals}:
            hits = probe(v)
            for k, vals in mem.items():
                if v in vals:
                    assert hits[k], f"false negative: {v} in group {k}"

    assert_no_false_negatives()
    assert not any(probe("never-inserted-xyz").values())

    # insert-only growth → merge path (delta-sized reduce input)
    seen = []
    orig = eng.reduce_table

    def spy(target, map_df=None):
        if map_df is not None:
            seen.append(map_df.count())
        return orig(target, map_df)

    eng.reduce_table = spy
    rows += [("n1", 0, "u99"), ("n2", 1, "u100")]
    set_source(rows)
    inc.apply_changes(notifications(spark, [
        ("source", "created", "n1"), ("source", "created", "n2")]))
    eng.reduce_table = orig
    assert max(seen) <= 2, f"bloom view rescanned a group: {seen}"
    assert probe("u99")["0"] and probe("u100")["1"]
    assert_no_false_negatives()

    # delete → recompute path; the view still holds every survivor
    rows = [r for r in rows if r[0] != "n1"]
    set_source(rows)
    inc.apply_changes(notifications(spark, [("source", "deleted", "n1")]))
    assert_no_false_negatives()
