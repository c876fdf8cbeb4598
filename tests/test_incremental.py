"""Incremental (CDC) lifecycle conformance — SURVEY §2.7 T2-T5, A8.

The golden sequence from the reference (tests/scripts/test_worker.py:98-116):
sum of values 1,2,3 = 6; update 1→2 and 3→5 → 9; delete the 5 → 4;
delete everything → reduce row disappears (empty-group elimination,
tests/test_processor.py:153-157).
"""

import pytest
from pyspark.sql import Row, functions as F

from qvarn_mr_spark.catalog import Catalog
from qvarn_mr_spark.operators import (
    BucketedParquetStateStore,
    IncrementalEngine,
    ParquetStateStore,
    ViewEngine,
    map_item,
    reduce_agg,
)
from qvarn_mr_spark.operators.incremental import notifications


@pytest.fixture(params=["plain", "bucketed"])
def setup(spark, tmp_path, request):
    cat = Catalog(spark)

    def set_source(rows):
        cat.register("source", spark.createDataFrame(
            rows, "id string, type string, revision string, key long, value long"))

    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 2),
                ("3", "source", "a", 1, 3)])
    eng = ViewEngine(cat, {
        "source__map": {"source": map_item("key", "value")},
        "sum_target": {"source__map": reduce_agg(F.sum)},
    })
    if request.param == "bucketed":
        store = BucketedParquetStateStore(spark, str(tmp_path / "state"),
                                          buckets=8)
    else:
        store = ParquetStateStore(spark, str(tmp_path / "state"))
    inc = IncrementalEngine(eng, store)
    return spark, cat, inc, set_source


def read_sums(inc):
    return {r["_mr_key"]: r["_mr_value"] for r in inc.read("sum_target").collect()}


def test_lifecycle_sum(setup):
    spark, cat, inc, set_source = setup

    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3")]))
    assert read_sums(inc) == {"1": 6}

    # update 1→2 and 3→5 → 9
    set_source([("1", "source", "b", 1, 2),
                ("2", "source", "a", 1, 2),
                ("3", "source", "b", 1, 5)])
    inc.apply_changes(notifications(spark, [
        ("source", "updated", "1"),
        ("source", "updated", "3")]))
    assert read_sums(inc) == {"1": 9}

    # delete the 5 → 4
    set_source([("1", "source", "b", 1, 2),
                ("2", "source", "a", 1, 2)])
    inc.apply_changes(notifications(spark, [("source", "deleted", "3")]))
    assert read_sums(inc) == {"1": 4}
    # tombstones purged after successful reduce (T3 two-phase)
    live = inc.read("source__map").filter("_mr_deleted").count()
    assert live == 0

    # delete everything → empty-group elimination (A8)
    set_source([])
    inc.apply_changes(notifications(spark, [
        ("source", "deleted", "1"), ("source", "deleted", "2")]))
    assert read_sums(inc) == {}


def test_key_change_moves_group(setup):
    # an update that CHANGES the key must recompute both old and new groups
    spark, cat, inc, set_source = setup
    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3")]))
    set_source([("1", "source", "b", 2, 1),   # key 1 → 2
                ("2", "source", "a", 1, 2),
                ("3", "source", "a", 1, 3)])
    inc.apply_changes(notifications(spark, [("source", "updated", "1")]))
    assert read_sums(inc) == {"1": 5, "2": 1}


def test_resync_bootstrap_equals_incremental(setup):
    spark, cat, inc, set_source = setup
    inc.resync_all()
    assert read_sums(inc) == {"1": 6}
    # resync_changed is a no-op when versions match
    assert inc.resync_changed() == []


def test_resync_changed_on_version_bump(setup):
    spark, cat, inc, set_source = setup
    inc.resync_all()
    # bump reduce handler version → only that target resyncs
    inc.engine.config["sum_target"]["source__map"] = reduce_agg(F.sum, version=2)
    changed = inc.resync_changed()
    assert changed == ["sum_target"]
    assert read_sums(inc) == {"1": 6}


@pytest.mark.sweep
def test_resync_interleaved_live_changes_converge(setup):
    """Worker interleave (reference worker.py:66-71): live notifications
    arriving between resync chunks are applied mid-backfill, and the final
    state equals a full recompute off the final source."""
    spark, cat, inc, set_source = setup
    inc.resync_all()
    assert read_sums(inc) == {"1": 6}

    # bump the reduce handler → chunked reduce resync with live interleave
    inc.engine.config["sum_target"]["source__map"] = reduce_agg(F.sum, version=2)
    live = [[("source", "updated", "2")], [("source", "deleted", "3")]]
    states = [[("1", "source", "a", 1, 1),
               ("2", "source", "b", 1, 7),
               ("3", "source", "a", 1, 3)],
              [("1", "source", "a", 1, 1),
               ("2", "source", "b", 1, 7)]]

    def drain():
        if live:
            set_source(states.pop(0))
            inc.apply_changes(notifications(spark, live.pop(0)))

    changed = inc.resync_interleaved(drain=drain, chunks=2)
    assert changed == ["sum_target"]
    assert live == []                      # both live batches were drained
    assert read_sums(inc) == {"1": 8}      # == full recompute of final source


@pytest.mark.sweep
def test_resync_interleaved_map_chunks_and_drift(setup):
    """Chunked MAP resync: each chunk is a hash-slice of current source ids
    through the normal notification path; rows whose source vanished with
    no delete notification are cleaned up by the final stale-delete batch,
    so the end state equals a full recompute."""
    spark, cat, inc, set_source = setup
    inc.resync_all()
    # source drifts while the map handler version is bumped: id 3 vanished
    # WITHOUT a delete notification, id 4 appeared
    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 2),
                ("4", "source", "a", 2, 10)])
    inc.engine.config["source__map"]["source"] = map_item(
        "key", "value", version=2)
    drains = []
    changed = inc.resync_interleaved(drain=lambda: drains.append(1), chunks=3)
    # the consumer closure includes the reduce: its inputs were re-mapped
    assert changed == ["source__map", "sum_target"]
    assert len(drains) >= 3                # one drain per chunk at least
    assert read_sums(inc) == {"1": 3, "2": 10}


@pytest.mark.sweep
def test_version_barrier_postpones_half_synced_keys(setup):
    """Reference conformance (test_processor.py:160-232): while a map
    handler upgrade is mid-backfill, a key whose live map rows mix handler
    versions keeps its OLD reduce value — the reduce is postponed until
    every row of the key is re-mapped. Observed through a chunked resync:
    at every chunk boundary the reduce shows either the complete old value
    or the complete new value, never a mix."""
    from pyspark.sql import functions as F2
    from qvarn_mr_spark.operators import map_expr

    spark, cat, inc, set_source = setup
    # one key, several rows — rows hash into different resync chunks
    set_source([(str(i), "source", "a", 1, i) for i in range(1, 7)])
    inc.resync_all()
    old_val = 1 + 2 + 3 + 4 + 5 + 6
    assert read_sums(inc) == {"1": old_val}

    # handler upgrade: value doubles
    inc.engine.config["source__map"]["source"] = map_expr(
        "key", F2.col("value") * 2, version=2)
    new_val = old_val * 2
    seen = []

    def drain():
        seen.append(read_sums(inc).get("1"))

    inc.resync_interleaved(drain=drain, chunks=4)
    assert read_sums(inc) == {"1": new_val}
    assert set(seen) <= {old_val, new_val}, seen   # never a mixed value
    assert old_val in seen                          # postponement observed


def test_multiple_changes_same_id_in_batch(setup):
    # created then deleted within one batch → final state wins
    spark, cat, inc, set_source = setup
    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 2)])
    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3"),
        ("source", "deleted", "3")]))
    assert read_sums(inc) == {"1": 3}


def test_dead_letter_replay_converges(setup):
    """T6/T11 lossless path: a notification that precedes its resource's
    visibility is dead-lettered, then replayed once the source catches up —
    the view converges to the full-recompute answer (reference drops after
    3 retries, processor.py:282-304; we keep and replay)."""
    spark, cat, inc, set_source = setup
    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3"),
        ("source", "created", "4"),      # not yet visible in the source
        ("source", "created", "ghost")]))  # never appears
    assert read_sums(inc) == {"1": 6}
    dl = {r["resource_id"]
          for r in inc.dead_letters("source__map").collect()}
    assert dl == {"4", "ghost"}

    # nothing to replay yet: both ids still missing
    assert inc.replay_dead_letters("source__map") == 0

    # the source catches up with id 4
    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 2),
                ("3", "source", "a", 1, 3),
                ("4", "source", "a", 1, 10)])
    assert inc.replay_dead_letters("source__map") == 1
    assert read_sums(inc) == {"1": 16}
    dl = {r["resource_id"]
          for r in inc.dead_letters("source__map").collect()}
    assert dl == {"ghost"}          # still-missing entry stays queued


def test_seqless_change_batch_rejected(setup):
    # F.last-without-order would be nondeterministic: require seq
    spark, cat, inc, set_source = setup
    seqless = spark.createDataFrame(
        [("source", "created", "1")],
        "resource_type string, resource_change string, resource_id string")
    with pytest.raises(ValueError, match="seq"):
        inc.apply_changes(seqless)


def test_store_versioning(spark, tmp_path):
    store = ParquetStateStore(spark, str(tmp_path / "s"))
    df1 = spark.createDataFrame([Row(a=1)])
    store.overwrite("t", df1)
    assert store.version("t") == 1
    store.overwrite("t", spark.createDataFrame([Row(a=2)]))
    assert store.version("t") == 2
    assert [r["a"] for r in store.read("t").collect()] == [2]


def test_incremental_join_view_lifecycle(spark, tmp_path):
    """The flagship entity-join view maintained incrementally: create both
    sides, update one, delete one — each CDC batch recomputes only the dirty
    key groups (reference join view e2e, tests/test_mapreduce.py:115-195)."""
    from qvarn_mr_spark.operators import reduce_join

    cat = Catalog(spark)

    def set_tables(orgs, reports):
        cat.register("orgs", spark.createDataFrame(
            orgs, "id string, type string, revision string, country string"))
        cat.register("reports", spark.createDataFrame(
            reports, "id string, type string, revision string, org string, seq long"))

    set_tables([("o1", "org", "r", "fi")],
               [("r1", "report", "r", "o1", 1)])
    eng = ViewEngine(cat, {
        "m": {"orgs": map_item("id"), "reports": map_item("org")},
        "v": {"m": reduce_join(
            {"orgs": {"country": "country"}, "reports": {"report_id": "id"}},
            order_by={"reports": "seq"})},
    })
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    inc = IncrementalEngine(eng, store)

    inc.apply_changes(notifications(spark, [
        ("orgs", "created", "o1"), ("reports", "created", "r1")]))
    got = {r["_mr_key"]: (r["country"], r["report_id"])
           for r in inc.read("v").collect()}
    assert got == {"o1": ("fi", "r1")}

    # second report arrives → last-writer (highest seq) wins
    set_tables([("o1", "org", "r", "fi")],
               [("r1", "report", "r", "o1", 1),
                ("r2", "report", "r", "o1", 2)])
    inc.apply_changes(notifications(spark, [("reports", "created", "r2")]))
    got = {r["_mr_key"]: (r["country"], r["report_id"])
           for r in inc.read("v").collect()}
    assert got == {"o1": ("fi", "r2")}

    # newest report deleted → falls back to r1
    set_tables([("o1", "org", "r", "fi")],
               [("r1", "report", "r", "o1", 1)])
    inc.apply_changes(notifications(spark, [("reports", "deleted", "r2")]))
    got = {r["_mr_key"]: (r["country"], r["report_id"])
           for r in inc.read("v").collect()}
    assert got == {"o1": ("fi", "r1")}

    # org deleted → group survives on the remaining report (outer semantics)
    set_tables([], [("r1", "report", "r", "o1", 1)])
    inc.apply_changes(notifications(spark, [("orgs", "deleted", "o1")]))
    got = {r["_mr_key"]: (r["country"], r["report_id"])
           for r in inc.read("v").collect()}
    assert got == {"o1": (None, "r1")}


# -- bucketed store: O(dirty-bucket) commits ---------------------------------

def _bucket_files(root, table):
    """{bucket: {relpath: sha256}} for every bucket the manifest references."""
    import hashlib
    import json
    import os
    tdir = os.path.join(root, table)
    with open(os.path.join(tdir, "_LATEST")) as f:
        v = int(f.read())
    with open(os.path.join(tdir, f"v{v}", "_MANIFEST.json")) as f:
        manifest = json.load(f)["buckets"]
    out = {}
    for b, vers in manifest.items():
        files = {}
        # owner CHAIN (r11): a bucket may be composed of one rewrite dir
        # plus append dirs; pre-chain manifests held a single int
        for ver in (vers if isinstance(vers, list) else [vers]):
            bdir = os.path.join(tdir, f"v{ver}", f"_bucket={b}")
            for name in sorted(os.listdir(bdir)):
                if name.endswith(".parquet"):
                    with open(os.path.join(bdir, name), "rb") as fh:
                        files[os.path.join(f"v{ver}", f"_bucket={b}",
                                           name)] = \
                            hashlib.sha256(fh.read()).hexdigest()
        out[b] = files
    return out


def test_bucketed_store_rewrites_only_dirty_buckets(spark, tmp_path):
    """A small dirty batch must leave untouched buckets' parquet files
    physically identical (same paths, same bytes) — the commit is O(dirty
    buckets), the demonstrable form of Delta/Iceberg MERGE cost."""
    cat = Catalog(spark)
    root = str(tmp_path / "state")

    def set_source(rows):
        cat.register("source", spark.createDataFrame(
            rows, "id string, type string, revision string, key long, value long"))

    rows = [(str(i), "source", "a", i % 20, i) for i in range(40)]
    set_source(rows)
    eng = ViewEngine(cat, {
        "source__map": {"source": map_item("key", "value")},
        "sum_target": {"source__map": reduce_agg(F.sum)},
    })
    store = BucketedParquetStateStore(spark, root, buckets=8)
    inc = IncrementalEngine(eng, store)
    inc.apply_changes(notifications(
        spark, [("source", "created", str(i)) for i in range(40)]))

    before = _bucket_files(root, "source__map")
    assert len(before) > 1                    # keys actually spread out

    # touch ONE resource (key 7) — only its bucket may be rewritten
    rows[7] = ("7", "source", "b", 7, 999)
    set_source(rows)
    inc.apply_changes(notifications(spark, [("source", "updated", "7")]))

    after = _bucket_files(root, "source__map")
    dirty = F.pmod(F.hash(F.lit("7")), F.lit(8))
    dirty_b = str(spark.range(1).select(dirty).collect()[0][0])
    changed = {b for b in before if before[b] != after.get(b)}
    assert changed == {dirty_b}
    for b in before:
        if b != dirty_b:                      # identical paths AND bytes
            assert after[b] == before[b]

    # and the derived view is still right: key 7 now sums to 999
    got = {r["_mr_key"]: r["_mr_value"]
           for r in inc.read("sum_target").collect()}
    want = {}
    for _id, _t, _r, k, v in rows:
        want[str(k)] = want.get(str(k), 0) + v
    assert got == want


def test_map_version_bump_refreshes_downstream_reduce(setup):
    """A map-handler upgrade must transitively resync its consumers: the
    reference re-walks every id through the notification path (re-reducing
    dirty keys); the one-shot overwrite expands the consumer closure
    instead. Without it the reduce view silently keeps pre-upgrade
    values."""
    spark, cat, inc, set_source = setup
    inc.resync_all()
    assert read_sums(inc) == {"1": 6}
    # handler change: the map now doubles values
    inc.engine.config["source__map"]["source"] = map_item(
        "key", F.col("value") * 2, version=2)
    changed = inc.resync_changed()
    assert changed == ["source__map", "sum_target"]
    assert read_sums(inc) == {"1": 12}


def test_snapshot_is_all_or_none_across_tables(setup):
    """r13 (VERDICT r12 #8): a snapshot opened MID-apply_changes —
    after the map target committed but before the reduce target did —
    must expose the PREVIOUS batch across both tables (none of the
    in-flight batch); a snapshot opened after the batch exposes all of
    it. Direct per-table reads at the same moment WOULD mix levels
    (map post-batch, reduce pre-batch) — the inconsistency snapshot()
    exists to remove."""
    spark, cat, inc, set_source = setup

    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3")]))
    assert read_sums(inc) == {"1": 6}

    # second batch: value 3 -> 5; pause right after the FIRST commit
    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 2),
                ("3", "source", "b", 1, 5)])
    mid = {}
    orig = inc.store.overwrite

    def hooked(table, df, **kw):
        orig(table, df, **kw)
        if table == "source__map" and not mid:
            snap = inc.snapshot()
            mid["map"] = {(r["_mr_key"], r["_mr_value"])
                          for r in snap.read("source__map")
                          .select("_mr_key", "_mr_value").collect()}
            mid["sum"] = {r["_mr_key"]: r["_mr_value"]
                          for r in snap.read("sum_target").collect()}
            # the direct (pointer-chasing) read DOES see the half state
            mid["direct_map"] = {
                (r["_mr_key"], r["_mr_value"])
                for r in inc.read("source__map")
                .select("_mr_key", "_mr_value").collect()}

    inc.store.overwrite = hooked
    try:
        inc.apply_changes(notifications(spark, [
            ("source", "updated", "3")]))
    finally:
        inc.store.overwrite = orig

    # mid-batch snapshot: the whole PREVIOUS state, both tables
    assert mid["map"] == {("1", 1), ("1", 2), ("1", 3)}
    assert mid["sum"] == {"1": 6}
    # while the unpinned read already observed the half-applied batch
    assert ("1", 5) in mid["direct_map"]
    # post-batch snapshot: the whole NEW state, both tables
    snap = inc.snapshot()
    live = snap.read("source__map")
    if "_mr_deleted" in live.columns:
        live = live.filter(~F.coalesce(F.col("_mr_deleted"), F.lit(False)))
    assert {(r["_mr_key"], r["_mr_value"]) for r in
            live.select("_mr_key", "_mr_value").collect()} \
        == {("1", 1), ("1", 2), ("1", 5)}
    assert {r["_mr_key"]: r["_mr_value"]
            for r in snap.read("sum_target").collect()} == {"1": 8}
    # the pinned frames survive the NEXT batch (retain window)
    held = inc.snapshot()
    set_source([("1", "source", "a", 1, 1),
                ("2", "source", "a", 1, 9),
                ("3", "source", "b", 1, 5)])
    inc.apply_changes(notifications(spark, [("source", "updated", "2")]))
    assert {r["_mr_key"]: r["_mr_value"]
            for r in held.read("sum_target").collect()} == {"1": 8}
    assert read_sums(inc) == {"1": 15}


def test_resync_publishes_one_epoch(setup):
    """r13 self-review: resync_all/resync_changed publish ONE epoch
    after the last target — a snapshot opened between two rebuilds
    (map new, reduce not yet) must still resolve to the whole
    pre-rebuild state, not pin a half-applied handler upgrade as
    consistent."""
    spark, cat, inc, set_source = setup
    inc.apply_changes(notifications(spark, [
        ("source", "created", "1"),
        ("source", "created", "2"),
        ("source", "created", "3")]))
    assert read_sums(inc) == {"1": 6}

    set_source([("1", "source", "a", 1, 10),
                ("2", "source", "a", 1, 20),
                ("3", "source", "a", 1, 30)])
    mid = {}
    orig = inc.store.overwrite

    def hooked(table, df, **kw):
        orig(table, df, **kw)
        if table == "source__map" and not mid:
            snap = inc.snapshot()
            mid["map"] = {(r["_mr_key"], r["_mr_value"]) for r in
                          snap.read("source__map")
                          .select("_mr_key", "_mr_value").collect()}
            mid["sum"] = {r["_mr_key"]: r["_mr_value"]
                          for r in snap.read("sum_target").collect()}

    inc.store.overwrite = hooked
    try:
        inc.resync_all()
    finally:
        inc.store.overwrite = orig
    # mid-rebuild snapshot: the whole PRE-resync state, both tables
    assert mid["map"] == {("1", 1), ("1", 2), ("1", 3)}
    assert mid["sum"] == {"1": 6}
    # post-rebuild snapshot: the whole NEW state
    snap = inc.snapshot()
    assert {r["_mr_value"] for r in snap.read("source__map")
            .select("_mr_value").collect()} == {10, 20, 30}
    assert {r["_mr_key"]: r["_mr_value"]
            for r in snap.read("sum_target").collect()} == {"1": 60}
