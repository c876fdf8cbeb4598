"""Worker CLI end-to-end — the reference's qvarnmr-worker drain-and-exit
flow (/root/reference/tests/scripts/test_worker.py) through
``qvarn_mr_spark.worker.main``."""

import pytest
import json
import sys
import textwrap

from qvarn_mr_spark import worker


@pytest.mark.sweep
def test_worker_resync_and_drain(spark, sf_dir, tmp_path, capsys):
    # a handlers-config module, imported by dotted path like the reference
    mod_dir = tmp_path / "mods"
    mod_dir.mkdir()
    (mod_dir / "myviews.py").write_text(textwrap.dedent("""
        from pyspark.sql import functions as F
        from qvarn_mr_spark.operators import map_item, reduce_agg
        CONFIG = {
            "ev__map": {"events": map_item("event_type", "value")},
            "value_by_type": {"ev__map": reduce_agg(
                {"total": lambda c: F.round(F.sum(c), 2)})},
        }
        ID_COLS = {"events": "event_id"}
    """))
    sys.path.insert(0, str(mod_dir))
    try:
        feed = tmp_path / "feed"
        feed.mkdir()
        # one pending notification referencing a real event id
        (feed / "n1.json").write_text(json.dumps(
            {"resource_type": "events", "resource_change": "updated",
             "resource_id": "0", "seq": 1}) + "\n")
        worker.main([
            "--handlers", "myviews:CONFIG",
            "--tables", sf_dir,
            "--state", str(tmp_path / "state"),
            "--feed", str(feed),
        ])
    finally:
        sys.path.remove(str(mod_dir))

    out = capsys.readouterr().out
    assert "resynced: ev__map, value_by_type" in out
    assert "feed drained" in out

    # the view materialized and covers every event type
    from qvarn_mr_spark.operators import ParquetStateStore
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    rows = {r["_mr_key"]: r["total"]
            for r in store.read("value_by_type").collect()}
    assert len(rows) == 5 and all(v > 0 for v in rows.values())
    # the single-writer lease was taken and cleanly released
    with open(tmp_path / "state" / "_WORKER_LEASE") as f:
        assert json.load(f)["owner"] is None


def test_worker_ini_config(spark, sf_dir, tmp_path, capsys):
    """Reference-shaped INI entry point (config.py:9-25, worker.py:30-33):
    everything in the [qvarnmr] section, no flags beyond -c."""
    mod_dir = tmp_path / "mods"
    mod_dir.mkdir()
    (mod_dir / "iniviews.py").write_text(textwrap.dedent("""
        from pyspark.sql import functions as F
        from qvarn_mr_spark.operators import map_item, reduce_count
        CONFIG = {
            "ev__map": {"events": map_item("event_type")},
            "count_by_type": {"ev__map": reduce_count()},
        }
        ID_COLS = {"events": "event_id"}
    """))
    feed = tmp_path / "feed"
    feed.mkdir()
    ini = tmp_path / "worker.ini"
    ini.write_text(textwrap.dedent(f"""
        [qvarnmr]
        handlers = iniviews:CONFIG
        tables = {sf_dir}
        state = {tmp_path / 'state'}
        feed = {feed}
        resync_chunks = 2
        lease_timeout = 60
    """))
    sys.path.insert(0, str(mod_dir))
    try:
        worker.main(["-c", str(ini)])
    finally:
        sys.path.remove(str(mod_dir))
    out = capsys.readouterr().out
    assert "resynced: ev__map, count_by_type" in out
    assert "feed drained" in out

    from qvarn_mr_spark.operators import ParquetStateStore
    store = ParquetStateStore(spark, str(tmp_path / "state"))
    total = sum(r["_mr_value"]
                for r in store.read("count_by_type").collect())
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


@pytest.mark.sweep
def test_worker_bucketed_store_and_extended_dag(spark, sf_dir, tmp_path,
                                                capsys):
    """--state-buckets selects the O(dirty-bucket)-commit store and
    --extended-dag admits a depth-4 config; the worker bootstraps it in
    topological order and the histogram equals a hand recompute."""
    mod_dir = tmp_path / "mods"
    mod_dir.mkdir()
    (mod_dir / "deepviews.py").write_text(textwrap.dedent("""
        from qvarn_mr_spark.operators import map_item, reduce_count
        CONFIG = {
            "ev__map": {"events": map_item("user_id")},
            "per_user": {"ev__map": reduce_count()},
            "hist__map": {"per_user": map_item("_mr_value")},
            "hist": {"hist__map": reduce_count()},
        }
        ID_COLS = {"events": "event_id"}
    """))
    feed = tmp_path / "feed"
    feed.mkdir()
    sys.path.insert(0, str(mod_dir))
    try:
        worker.main([
            "--handlers", "deepviews:CONFIG",
            "--tables", sf_dir,
            "--state", str(tmp_path / "state"),
            "--feed", str(feed),
            "--state-buckets", "8",
            "--extended-dag",
            "--no-lease",
        ])
    finally:
        sys.path.remove(str(mod_dir))
    out = capsys.readouterr().out
    assert "resynced:" in out

    from pyspark.sql import functions as F

    from qvarn_mr_spark.operators import BucketedParquetStateStore
    store = BucketedParquetStateStore(spark, str(tmp_path / "state"),
                                      buckets=8)
    got = {r["_mr_key"]: r["_mr_value"]
           for r in store.read("hist").collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    want = {str(r["n"]): r["c"] for r in
            per_user.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
            .collect()}
    assert got == want


def test_corpus_cli_end_to_end(spark, sf_dir, tmp_path, capsys):
    """The corpus pipeline as a job: parquet in, trainer shards +
    JSON-lines manifest out."""
    import json as _json

    from qvarn_mr_spark import corpus_cli

    out = str(tmp_path / "shards")
    corpus_cli.main([
        "--input", f"{sf_dir}/documents.parquet",
        "--output", out,
        "--min-quality", "0.0", "--min-tokens", "2",
        "--window", "128", "--shards", "2",
        "--train", "0.8", "--val", "0.1", "--test", "0.1",
        "--stats",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rows = [_json.loads(l) for l in lines]
    stats = [r for r in rows if "stat" in r]
    manifest = [r for r in rows if "stat" not in r]
    assert stats and manifest
    assert {m["split"] for m in manifest} <= {"train", "val", "test"}
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert set(written.columns) >= {"doc_id", "text", "n_tokens",
                                    "start_offset", "pack_first"}
