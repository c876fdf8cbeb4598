"""Seeded randomized CDC lifecycle — incremental (algebraic merges and
deep-DAG propagation included) must equal a from-scratch model after EVERY
batch, across a change mix no hand-written scenario covers.

One fixed seed keeps the run reproducible (the no-wall-clock-randomness
rule); breadth comes from length of the sequence, not reseeding."""

import random

import pytest

pytestmark = pytest.mark.sweep
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import Catalog
from qvarn_mr_spark.operators import (
    IncrementalEngine,
    ParquetStateStore,
    ViewEngine,
    map_item,
    reduce_agg,
    reduce_count,
)
from qvarn_mr_spark.operators.mapreduce import MERGE_ADD, MERGE_MAX, MERGE_MIN
from qvarn_mr_spark.operators.incremental import notifications

N_BATCHES = 6
OPS_PER_BATCH = 8
N_KEYS = 4


def _run_lifecycle(spark, tmp_path, config, id_cols, strict, read_view,
                   expected):
    rng = random.Random(20260813)
    cat = Catalog(spark)
    state = {}                      # id -> (key, value)
    next_id = [0]

    def sync():
        cat.register("source", spark.createDataFrame(
            [(i, k, v) for i, (k, v) in state.items()] or
            [("_none_", -1, -1)],
            "id string, key long, value long").filter(
                F.col("id") != "_none_"))

    eng = None
    for b in range(N_BATCHES):
        batch = []
        for _ in range(OPS_PER_BATCH):
            op = rng.choice(["create", "create", "update", "delete"])
            if op == "create" or not state:
                rid = f"r{next_id[0]}"; next_id[0] += 1
                state[rid] = (rng.randrange(N_KEYS), rng.randrange(-50, 50))
                batch.append(("source", "created", rid))
            elif op == "update":
                rid = rng.choice(sorted(state))
                state[rid] = (rng.randrange(N_KEYS), rng.randrange(-50, 50))
                batch.append(("source", "updated", rid))
            else:
                rid = rng.choice(sorted(state))
                del state[rid]
                batch.append(("source", "deleted", rid))
        sync()
        if eng is None:
            veng = ViewEngine(cat, config, id_cols=id_cols, strict=strict)
            eng = IncrementalEngine(
                veng, ParquetStateStore(spark, str(tmp_path / "s")))
        eng.apply_changes(notifications(spark, batch))
        assert read_view(eng) == expected(state), f"diverged at batch {b}"


def test_randomized_algebraic_view(spark, tmp_path):
    config = {
        "m": {"source": map_item("key", "value")},
        "v": {"m": reduce_agg(
            {"s": lambda c: F.sum(c), "n": lambda c: F.count(F.lit(1)),
             "mn": lambda c: F.min(c), "mx": lambda c: F.max(c)},
            merge={"s": MERGE_ADD, "n": MERGE_ADD,
                   "mn": MERGE_MIN, "mx": MERGE_MAX})},
    }

    def read_view(eng):
        return {r["_mr_key"]: (r["s"], r["n"], r["mn"], r["mx"])
                for r in eng.read("v").collect()}

    def expected(state):
        out = {}
        for key, value in state.values():
            s, n, mn, mx = out.get(str(key), (0, 0, None, None))
            out[str(key)] = (s + value, n + 1,
                             value if mn is None else min(mn, value),
                             value if mx is None else max(mx, value))
        return out

    _run_lifecycle(spark, tmp_path, config, {"source": "id"}, True,
                   read_view, expected)


def test_randomized_streaming_deep_dag(spark, tmp_path):
    """The same seeded CDC mix, but driven end-to-end through the
    STREAMING maintainer (ResourceStore CRUD → notification feed →
    foreachBatch → IncrementalEngine) over an extended DAG that contains
    both an algebraic-merge view and a depth-4 count-of-counts chain —
    sealing the one composition the batch-only differentials skipped."""
    from qvarn_mr_spark.catalog import Catalog
    from qvarn_mr_spark.sources import ResourceStore
    from qvarn_mr_spark.streaming import StreamingMaintainer

    class StoreCatalog(Catalog):
        def __init__(self, sp, rstore):
            super().__init__(sp)
            self.rstore = rstore

        def get(self, name):
            if name == "source":
                return self.rstore.table("source")
            return super().get(name)

    rstore = ResourceStore(spark, str(tmp_path / "store"),
                           feed_dir=str(tmp_path / "feed"))
    cat = StoreCatalog(spark, rstore)
    config = {
        "am": {"source": map_item("key", "value")},
        "agg": {"am": reduce_agg(
            {"s": lambda c: F.sum(c), "n": lambda c: F.count(F.lit(1))},
            merge={"s": MERGE_ADD, "n": MERGE_ADD})},
        "cm": {"source": map_item("key")},
        "per_key": {"cm": reduce_count()},
        "hm": {"per_key": map_item("_mr_value")},
        "hist": {"hm": reduce_count()},
    }
    veng = ViewEngine(cat, config, id_cols={"source": "id"}, strict=False)
    eng = IncrementalEngine(veng, ParquetStateStore(spark,
                                                    str(tmp_path / "s")))
    sm = StreamingMaintainer(eng, feed_dir=str(tmp_path / "feed"),
                             checkpoint_dir=str(tmp_path / "ckpt"))

    rng = random.Random(20260814)
    state = {}                      # rstore id -> (key, value)

    def expected_agg():
        out = {}
        for key, value in state.values():
            s, n = out.get(str(key), (0, 0))
            out[str(key)] = (s + value, n + 1)
        return out

    def expected_hist():
        per_key = {}
        for key, _v in state.values():
            per_key[key] = per_key.get(key, 0) + 1
        hist = {}
        for n in per_key.values():
            hist[str(n)] = hist.get(str(n), 0) + 1
        return hist

    for b in range(4):
        for _ in range(OPS_PER_BATCH):
            op = rng.choice(["create", "create", "update", "delete"])
            if op == "create" or not state:
                kv = (rng.randrange(N_KEYS), rng.randrange(-50, 50))
                rid = rstore.create("source",
                                    {"key": kv[0], "value": kv[1]})
                state[rid] = kv
            elif op == "update":
                rid = rng.choice(sorted(state))
                kv = (rng.randrange(N_KEYS), rng.randrange(-50, 50))
                rstore.update("source", rid,
                              {"key": kv[0], "value": kv[1]})
                state[rid] = kv
            else:
                rid = rng.choice(sorted(state))
                rstore.delete("source", rid)
                del state[rid]
        sm.run_available()
        got_agg = {r["_mr_key"]: (r["s"], r["n"])
                   for r in eng.read("agg").collect()}
        assert got_agg == expected_agg(), f"agg diverged at batch {b}"
        got_hist = {r["_mr_key"]: r["_mr_value"]
                    for r in eng.read("hist").collect()}
        assert got_hist == expected_hist(), f"hist diverged at batch {b}"


def test_randomized_deep_dag(spark, tmp_path):
    config = {
        "m": {"source": map_item("key")},
        "per_key": {"m": reduce_count()},
        "hm": {"per_key": map_item("_mr_value")},
        "hist": {"hm": reduce_count()},
    }

    def read_view(eng):
        return {r["_mr_key"]: r["_mr_value"]
                for r in eng.read("hist").collect()}

    def expected(state):
        per_key = {}
        for key, _value in state.values():
            per_key[key] = per_key.get(key, 0) + 1
        hist = {}
        for n in per_key.values():
            hist[str(n)] = hist.get(str(n), 0) + 1
        return hist

    _run_lifecycle(spark, tmp_path, config, {"source": "id"}, False,
                   read_view, expected)
