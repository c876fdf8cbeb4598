"""Worker entry point — the engine's analogue of ``qvarnmr-worker``.

Reference CLI (``/root/reference/qvarnmr/scripts/worker.py:27-101``):
read INI config (+ optional logging sections, ``config.py:9-25``) → import
handlers (dotted path → module attribute) → claim the single-writer lease →
resync changed handlers interleaved with live changes → process the
notification feed, forever or until drained.

Spark form::

    python -m qvarn_mr_spark.worker --handlers mypkg.views:CONFIG \
        --tables /root/testdata/sf0.01 --state /tmp/state \
        --feed /tmp/feed [--forever] [--interval "1 second"]

or with everything in an INI file (flags override file values)::

    python -m qvarn_mr_spark.worker -c worker.ini

    # worker.ini
    [qvarnmr]
    handlers = mypkg.views:CONFIG
    tables = /root/testdata/sf0.01
    state = /tmp/state
    feed = /tmp/feed
    forever = true
    interval = 1 second
    resync_chunks = 8
    lease_interval = 10
    lease_timeout = 60
    # plus optional [loggers]/[handlers]/[formatters] sections, passed to
    # logging.config.fileConfig exactly like the reference

``--handlers`` names a module attribute holding the view config
(``{target: {source: spec}}`` — the same shape the reference imports,
``handlers.py:5-8``). The module may also export ``ID_COLS`` mapping
source name → primary-key column. Startup takes the state-dir
:class:`~qvarn_mr_spark.streaming.lease.WorkerLease` (reference keep-alive,
``worker.py:51-61``; disable with ``--no-lease``), then runs
:meth:`~qvarn_mr_spark.streaming.maintainer.StreamingMaintainer.
run_with_resync` — the reference's interleaved startup (``worker.py:66-71``).
"""

from __future__ import annotations

import argparse
import importlib


def import_handlers(spec: str):
    """``'module.path:ATTR'`` → ``(config, id_cols)`` (reference
    ``handlers.py:5-8`` uses the same dotted-path convention)."""
    mod_path, _, attr = spec.partition(":")
    if not attr:
        mod_path, _, attr = spec.rpartition(".")
    module = importlib.import_module(mod_path)
    return getattr(module, attr), getattr(module, "ID_COLS", {})


def load_config(path: str) -> dict:
    """Read the reference-shaped INI (``config.py:9-25``): the ``[qvarnmr]``
    section becomes worker options; logging sections, if present, configure
    logging exactly like the reference does."""
    import configparser
    import logging.config

    parser = configparser.RawConfigParser()
    with open(path) as f:            # surface a clear error on a bad path
        parser.read_file(f)
    if parser.has_section("loggers"):
        logging.config.fileConfig(parser, disable_existing_loggers=False)
    return dict(parser.items("qvarnmr")) if parser.has_section("qvarnmr") \
        else {}


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", default=None,
                   help="INI config file ([qvarnmr] section; flags override)")
    p.add_argument("--handlers",
                   help="dotted path to view config: 'pkg.mod:CONFIG'")
    p.add_argument("--tables", help="directory of source parquet tables")
    p.add_argument("--state", help="state store root")
    p.add_argument("--feed",
                   help="notification feed directory (JSON lines)")
    p.add_argument("--checkpoint", default=None,
                   help="stream checkpoint dir (default: <state>/_checkpoint)")
    p.add_argument("--forever", action="store_true", default=None,
                   help="follow the feed continuously instead of drain-and-exit")
    p.add_argument("--interval", default=None,
                   help="trigger interval in --forever mode")
    p.add_argument("--resync-chunks", type=int, default=None,
                   help="hash-slice count for interleaved resync")
    p.add_argument("--no-lease", action="store_true",
                   help="skip the single-writer state-dir lease")
    p.add_argument("--state-buckets", type=int, default=None,
                   help="bucket count for the O(dirty-bucket)-commit state "
                        "store (0/absent = plain full-snapshot store)")
    p.add_argument("--extended-dag", action="store_true", default=None,
                   help="admit extended (deep DAG) view configs, maintained "
                        "via topological dirty propagation")
    args = p.parse_args(argv)

    cfg = load_config(args.config) if args.config else {}

    def opt(name: str, default=None):
        v = getattr(args, name)
        return v if v is not None else cfg.get(name, default)

    handlers, tables = opt("handlers"), opt("tables")
    state, feed = opt("state"), opt("feed")
    if not all([handlers, tables, state, feed]):
        p.error("handlers, tables, state and feed are required "
                "(as flags or in the [qvarnmr] config section)")
    forever = args.forever if args.forever is not None else \
        str(cfg.get("forever", "")).lower() in ("1", "true", "yes", "on")
    interval = opt("interval", "1 second")
    chunks = int(opt("resync_chunks", cfg.get("resync_chunks", 8)))
    lease_interval = float(cfg.get("lease_interval", 10))
    lease_timeout = float(cfg.get("lease_timeout", 60))

    from qvarn_mr_spark.catalog import Catalog
    from qvarn_mr_spark.operators import (
        BucketedParquetStateStore,
        IncrementalEngine,
        ParquetStateStore,
        ViewEngine,
    )
    from qvarn_mr_spark.session import get_spark
    from qvarn_mr_spark.streaming import StreamingMaintainer

    spark = get_spark("qvarn-mr-worker")
    config, id_cols = import_handlers(handlers)
    cat = Catalog.from_dir(spark, tables)
    # state_buckets > 0 selects the O(dirty-bucket)-commit store (manifest
    # over immutable bucket files); 0 = plain full-snapshot store. strict =
    # false admits extended DAG configs (map-over-reduce etc.), maintained
    # via topological dirty propagation.
    state_buckets = int(opt("state_buckets", 0) or 0)
    extended = args.extended_dag if args.extended_dag is not None else \
        str(cfg.get("extended_dag", "")).lower() in ("1", "true", "yes", "on")
    strict = not extended
    store = (BucketedParquetStateStore(spark, state, buckets=state_buckets)
             if state_buckets > 0 else ParquetStateStore(spark, state))
    inc = IncrementalEngine(
        ViewEngine(cat, config, id_cols=id_cols, strict=strict), store)
    sm = StreamingMaintainer(inc, feed,
                             args.checkpoint or f"{state}/_checkpoint")
    lease = None if args.no_lease else sm.lease(lease_interval, lease_timeout)
    if lease:
        lease.acquire()
    try:
        changed = sm.run_with_resync(chunks=chunks)
        if changed:
            print(f"resynced: {', '.join(changed)}")
        if forever:
            q = sm.start_forever(interval)
            try:
                # awaitTermination(timeout) doubles as the keep-alive tick —
                # the reference refreshes between polls (worker.py:80-85)
                while not q.awaitTermination(lease_interval):
                    if lease:
                        lease.keep_alive()
            finally:
                q.stop()
        else:
            print("feed drained")
    finally:
        if lease:
            lease.release()


if __name__ == "__main__":
    main()
