"""Incremental maintenance of extended (deep DAG) configs.

The reference's engine is structurally limited to map→reduce depth (one
notification at a time); the Spark engine applies any acyclic config in
topological order, turning each derived target's dirty keys into a
synthetic notification batch for its consumers. The canonical depth-4
example: per-user order counts, then a histogram of those counts
(count-of-counts) — source → map → reduce → map-over-reduce → reduce.
Every lifecycle step compares the incrementally-maintained histogram to a
from-scratch recompute of the same config.
"""

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import Catalog
from qvarn_mr_spark.operators import (
    IncrementalEngine,
    ParquetStateStore,
    ViewEngine,
    map_item,
    reduce_count,
)
from qvarn_mr_spark.operators.incremental import notifications


def _setup(spark, tmp_path):
    cat = Catalog(spark)

    def set_source(rows):
        cat.register("orders", spark.createDataFrame(
            rows, "id string, custkey long"))

    eng = ViewEngine(cat, {
        "orders__map": {"orders": map_item("custkey")},
        "per_user": {"orders__map": reduce_count()},
        # re-key: count value becomes the key (count-of-counts histogram)
        "hist__map": {"per_user": map_item("_mr_value")},
        "hist": {"hist__map": reduce_count()},
    }, id_cols={"orders": "id"}, strict=False)
    inc = IncrementalEngine(eng, ParquetStateStore(spark, str(tmp_path / "s")))
    return cat, eng, inc, set_source


def _hist(inc):
    return {r["_mr_key"]: r["_mr_value"]
            for r in inc.read("hist").collect()}


def _expected(rows):
    per_user = {}
    for _id, custkey in rows:
        per_user[custkey] = per_user.get(custkey, 0) + 1
    hist = {}
    for n in per_user.values():
        hist[str(n)] = hist.get(str(n), 0) + 1
    return hist


@pytest.mark.sweep
def test_deep_dag_lifecycle_matches_recompute(spark, tmp_path):
    cat, eng, inc, set_source = _setup(spark, tmp_path)
    rows = [("o1", 1), ("o2", 1), ("o3", 2)]
    set_source(rows)
    inc.apply_changes(notifications(spark, [
        ("orders", "created", "o1"), ("orders", "created", "o2"),
        ("orders", "created", "o3")]))
    # user 1 has 2 orders, user 2 has 1 → hist {2:1, 1:1}
    assert _hist(inc) == _expected(rows) == {"2": 1, "1": 1}

    # create: user 2 gains an order → both users at 2 → hist {2:2}
    rows.append(("o4", 2))
    set_source(rows)
    inc.apply_changes(notifications(spark, [("orders", "created", "o4")]))
    assert _hist(inc) == _expected(rows) == {"2": 2}

    # update moves an order between users (re-key through all 4 levels)
    rows = [r if r[0] != "o2" else ("o2", 3) for r in rows]
    set_source(rows)
    inc.apply_changes(notifications(spark, [("orders", "updated", "o2")]))
    assert _hist(inc) == _expected(rows) == {"1": 2, "2": 1}

    # delete: user 3's only order goes → user disappears from per_user,
    # the synthetic delete must ripple into the histogram
    rows = [r for r in rows if r[0] != "o2"]
    set_source(rows)
    inc.apply_changes(notifications(spark, [("orders", "deleted", "o2")]))
    assert _hist(inc) == _expected(rows) == {"1": 1, "2": 1}

    # drain everything → empty-group elimination cascades to depth 4
    set_source([])
    inc.apply_changes(notifications(spark, [
        ("orders", "deleted", "o1"), ("orders", "deleted", "o3"),
        ("orders", "deleted", "o4")]))
    assert _hist(inc) == {}


@pytest.mark.sweep
def test_deep_dag_untouched_keys_stay_clean(spark, tmp_path):
    """A change to one user must not mark other histogram buckets dirty:
    the synthetic batches carry only the propagated dirty keys."""
    cat, eng, inc, set_source = _setup(spark, tmp_path)
    rows = [(f"o{i}", i) for i in range(20)]          # 20 users, 1 order each
    set_source(rows)
    inc.apply_changes(notifications(
        spark, [("orders", "created", f"o{i}") for i in range(20)]))
    assert _hist(inc) == {"1": 20}

    rows.append(("x", 0))                              # user 0 → 2 orders
    set_source(rows)
    inc.apply_changes(notifications(spark, [("orders", "created", "x")]))
    assert _hist(inc) == {"1": 19, "2": 1}
    # the histogram map's dirty set after the last batch covers only the
    # propagated per_user keys (user 0's old count 1 and new count 2) —
    # never all 20 users
    dirty = {r["_mr_key"] for r in inc.store.read("hist__map__dirty")
             .collect()}
    assert dirty <= {"1", "2"}


def test_deep_dag_resync_bootstrap(spark, tmp_path):
    """resync_all in topological order bootstraps a deep DAG from nothing,
    and the incremental path continues from it seamlessly."""
    cat, eng, inc, set_source = _setup(spark, tmp_path)
    rows = [("a", 1), ("b", 1), ("c", 2), ("d", 3)]
    set_source(rows)
    inc.resync_all()
    assert _hist(inc) == _expected(rows) == {"2": 1, "1": 2}
    rows.append(("e", 3))
    set_source(rows)
    inc.apply_changes(notifications(spark, [("orders", "created", "e")]))
    assert _hist(inc) == _expected(rows) == {"2": 2, "1": 1}


@pytest.mark.sweep
def test_map_resync_prefers_stored_upstream_snapshot(spark, tmp_path):
    """Resync of a map-over-derived target must rebuild from the STORED
    upstream snapshot (like the reduce branch and the incremental path),
    not batch-recompute the upstream from the catalog: when the feed has
    undrained changes, a catalog recompute would transiently jump the
    downstream ahead of its stored parent level."""
    cat, eng, inc, set_source = _setup(spark, tmp_path)
    rows = [("o1", 1), ("o2", 1), ("o3", 2)]
    set_source(rows)
    inc.apply_changes(notifications(spark, [
        ("orders", "created", "o1"), ("orders", "created", "o2"),
        ("orders", "created", "o3")]))

    # the catalog advances but the o9 notification is NOT yet drained:
    # stored per_user (users 1, 2) lags the catalog (users 1, 2, 9)
    set_source(rows + [("o9", 9)])
    inc.resync("hist__map")
    ids = {r["_mr_source_id"] for r in inc.read("hist__map").collect()}
    assert ids == {"1", "2"}, "resync leaked catalog state past the store"

    # after draining, a resync sees the new user through the store
    inc.apply_changes(notifications(spark, [("orders", "created", "o9")]))
    inc.resync("hist__map")
    ids = {r["_mr_source_id"] for r in inc.read("hist__map").collect()}
    assert ids == {"1", "2", "9"}
