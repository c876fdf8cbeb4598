"""Count-min sketch: overestimate/bound properties, linear merge, and
incremental maintenance through the algebraic IVM path."""

import pytest

import math
import random

from pyspark.sql import functions as F

from qvarn_mr_spark.functions.sketches import (
    CMS_DEPTH,
    _cms_cols,
    cms_estimate,
    cms_merge,
    cms_rollup,
)


def _items(spark, pairs):
    return spark.createDataFrame(pairs, "id string, item string")


def _freq(pairs):
    out = {}
    for _i, it in pairs:
        out[it] = out.get(it, 0) + 1
    return out


def test_cms_overestimates_never_under(spark):
    rng = random.Random(7)
    pairs = [(str(i), f"w{rng.randrange(40)}") for i in range(600)]
    df = _items(spark, pairs)
    sk = cms_rollup(df, [], "item", width=64)
    true = _freq(pairs)
    qs = spark.createDataFrame([(w,) for w in true], "item string")
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(sk, qs, "item", width=64).collect()}
    n = len(pairs)
    eps = math.e / 64
    assert all(est[w] >= c for w, c in true.items())
    # the e*N/w bound holds with prob 1-e^-depth per item; allow a couple
    over = [w for w, c in true.items() if est[w] > c + eps * n]
    assert len(over) <= max(2, len(true) // 10), over
    # unseen items estimate small (0 unless all cells collide)
    ghost = cms_estimate(sk, spark.createDataFrame(
        [("neverseen-xyz",)], "item string"), "item", width=64).collect()
    assert ghost[0]["est_count"] <= eps * n


def test_cms_wide_sketch_is_exact(spark):
    pairs = [("1", "a")] * 5 + [("2", "b")] * 3 + [("3", "c")]
    df = _items(spark, [(str(i), it) for i, (_, it) in enumerate(pairs)])
    sk = cms_rollup(df, [], "item", width=4096)
    qs = spark.createDataFrame([("a",), ("b",), ("c",)], "item string")
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(sk, qs, "item", width=4096).collect()}
    assert est == {"a": 5, "b": 3, "c": 1}


def test_cms_merge_is_linear(spark):
    rng = random.Random(11)
    pa = [(str(i), f"w{rng.randrange(20)}") for i in range(200)]
    pb = [(str(i + 500), f"w{rng.randrange(20)}") for i in range(150)]
    one_pass = {(r["cms_row"], r["cms_col"]): r["cms_count"]
                for r in cms_rollup(_items(spark, pa + pb), [], "item")
                .collect()}
    merged = {(r["cms_row"], r["cms_col"]): r["cms_count"]
              for r in cms_merge(
                  cms_rollup(_items(spark, pa), [], "item")
                  .unionByName(cms_rollup(_items(spark, pb), [], "item")),
                  []).collect()}
    assert one_pass == merged


def test_cms_negative_weights_cancel(spark):
    """Linearity means deletions work: weight -1 rows retract exactly."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1), ("a", -1)],
        "item string, w int")
    sk = cms_rollup(df, [], "item", weight_col="w", width=1024)
    qs = spark.createDataFrame([("a",), ("b",)], "item string")
    est = {r["item"]: r["est_count"]
           for r in cms_estimate(sk, qs, "item", width=1024).collect()}
    assert est == {"a": 1, "b": 1}


def test_cms_grouped_rollup(spark):
    df = spark.createDataFrame(
        [("g1", "x"), ("g1", "x"), ("g2", "x"), ("g2", "y")],
        "g string, item string")
    sk = cms_rollup(df, ["g"], "item", width=512)
    qs = spark.createDataFrame(
        [("g1", "x"), ("g2", "x"), ("g2", "y")], "g string, item string")
    est = {(r["g"], r["item"]): r["est_count"]
           for r in cms_estimate(sk, qs, "item", ["g"],
                                 width=512).collect()}
    assert est == {("g1", "x"): 2, ("g2", "x"): 1, ("g2", "y"): 1}
    # merging away the group dimension equals the ungrouped sketch
    coarse = {(r["cms_row"], r["cms_col"]): r["cms_count"]
              for r in cms_merge(sk, []).collect()}
    flat = {(r["cms_row"], r["cms_col"]): r["cms_count"]
            for r in cms_rollup(df, [], "item", width=512).collect()}
    assert coarse == flat


@pytest.mark.sweep
def test_cms_maintained_incrementally(spark, tmp_path):
    """A CMS counter view maintained by the algebraic IVM path (MERGE_ADD
    on insert-only dirty keys, recompute on deletes) equals the batch
    rollup after every CDC batch."""
    from qvarn_mr_spark.catalog import Catalog
    from qvarn_mr_spark.operators import (
        IncrementalEngine,
        ParquetStateStore,
        ViewEngine,
        reduce_agg,
    )
    from qvarn_mr_spark.operators.mapreduce import MERGE_ADD, map_expr
    from qvarn_mr_spark.operators.incremental import notifications

    width = 64
    cell_keys = F.transform(
        _cms_cols(F.col("item").cast("string"), CMS_DEPTH, width),
        lambda c, i: F.concat(i.cast("string"), F.lit("|"),
                              c.cast("string")))
    cat = Catalog(spark)
    config = {
        "cells": {"source": map_expr(key=cell_keys, value=F.lit(1),
                                     explode_key=True)},
        "cms": {"cells": reduce_agg({"c": lambda c: F.sum(c)},
                                    merge={"c": MERGE_ADD})},
    }
    eng = None
    state = {}
    rng = random.Random(20260814)
    next_id = [0]

    def sync():
        rows = [(i, it) for i, it in state.items()] or [("_n_", None)]
        cat.register("source", spark.createDataFrame(
            rows, "id string, item string").filter(F.col("id") != "_n_"))

    for b in range(4):
        batch = []
        for _ in range(10):
            op = rng.choice(["create", "create", "create", "delete"])
            if op == "create" or not state:
                rid = f"r{next_id[0]}"; next_id[0] += 1
                state[rid] = f"w{rng.randrange(8)}"
                batch.append(("source", "created", rid))
            else:
                rid = rng.choice(sorted(state))
                del state[rid]
                batch.append(("source", "deleted", rid))
        sync()
        if eng is None:
            veng = ViewEngine(cat, config, id_cols={"source": "id"},
                              strict=False)
            eng = IncrementalEngine(
                veng, ParquetStateStore(spark, str(tmp_path / "s")))
        eng.apply_changes(notifications(spark, batch))
        got = {r["_mr_key"]: r["c"] for r in eng.read("cms").collect()}
        want = {f"{r['cms_row']}|{r['cms_col']}": r["cms_count"]
                for r in cms_rollup(cat.get("source"), [], "item",
                                    width=width).collect()}
        assert got == want, f"diverged at batch {b}"


def test_cms_driver_query_is_exact_at_sf001(spark, sf_dir):
    """The events_type_counts_cms driver query is collision-free at width
    1024 with the fixed seeds — pin the exactness the oracle relies on."""
    import __spark_entry__ as entry
    got = {r["event_type"]: r["est_count"]
           for r in entry.queries()["events_type_counts_cms"](
               spark, sf_dir).collect()}
    from qvarn_mr_spark.catalog import load_tables
    ev = load_tables(spark, sf_dir, tables=("events",))["events"]
    want = {r["event_type"]: r["n"]
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Bloom filter (same mergeable long-form family as the CMS above)
# ---------------------------------------------------------------------------

def _bloom_hits(spark, items_df, member_col, sketch, **kw):
    from qvarn_mr_spark.functions import sketches as sk
    packed = sk.bloom_pack(sketch, kw.get("num_bits", sk.BLOOM_BITS))
    probe = items_df.join(F.broadcast(packed))
    return probe.withColumn(
        "hit", sk.bloom_might_contain(F.col("bloom"), F.col(member_col),
                                      kw.get("num_bits", sk.BLOOM_BITS),
                                      kw.get("num_hashes", sk.BLOOM_HASHES)))


def test_bloom_no_false_negatives(spark):
    from qvarn_mr_spark.functions import sketches as sk
    items = spark.range(500).select(
        F.concat(F.lit("item-"), F.col("id")).alias("it"))
    sketch = sk.bloom_rollup(items, [], "it")
    hits = _bloom_hits(spark, items, "it", sketch)
    assert hits.filter(~F.col("hit")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    from qvarn_mr_spark.functions import sketches as sk
    items = spark.range(500).select(
        F.concat(F.lit("item-"), F.col("id")).alias("it"))
    sketch = sk.bloom_rollup(items, [], "it")
    absent = spark.range(2000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("it"))
    fp = _bloom_hits(spark, absent, "it", sketch) \
        .filter(F.col("hit")).count()
    # design rate at 2^16 bits / 4 hashes / 500 items is ~1e-6;
    # assert a loose 1% ceiling so the test never flakes
    assert fp <= 20


def test_bloom_merge_equals_rebuild(spark):
    from qvarn_mr_spark.functions import sketches as sk
    a = spark.range(100).select(F.col("id").cast("string").alias("it"))
    b = spark.range(50, 200).select(
        F.col("id").cast("string").alias("it"))
    merged = sk.bloom_merge(
        sk.bloom_rollup(a, [], "it").unionAll(
            sk.bloom_rollup(b, [], "it")), [])
    rebuilt = sk.bloom_rollup(a.unionAll(b), [], "it")
    m = {(r["bloom_word"]): r["bloom_mask"] for r in merged.collect()}
    r2 = {(r["bloom_word"]): r["bloom_mask"] for r in rebuilt.collect()}
    assert m == r2


def test_bloom_grouped_rollup_words_bounded(spark):
    from qvarn_mr_spark.functions import sketches as sk
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("g"),
        F.col("id").cast("string").alias("it"))
    sketch = sk.bloom_rollup(df, ["g"], "it", num_bits=1 << 10)
    per_g = sketch.groupBy("g").count().collect()
    assert all(r["count"] <= (1 << 10) // 64 for r in per_g)
    assert len(per_g) == 4
