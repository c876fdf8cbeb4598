"""Worker entry point — the engine's analogue of ``qvarnmr-worker``.

Reference CLI (``/root/reference/qvarnmr/scripts/worker.py:27-101``):
read config → import handlers (dotted path → module attribute) → resync
changed handlers → process the notification feed, forever or until drained.

Spark form::

    python -m qvarn_mr_spark.worker --handlers mypkg.views:CONFIG \
        --tables /root/testdata/sf0.01 --state /tmp/state \
        --feed /tmp/feed [--forever] [--interval "1 second"]

``--handlers`` names a module attribute holding the view config
(``{target: {source: spec}}`` — the same shape the reference imports,
``handlers.py:5-8``). Resync-on-version-change runs first
(``resync_changed``, the reference's startup loop ``worker.py:66-71``),
then the feed is drained once (default) or followed forever. No lease
machinery (reference T9): the streaming checkpoint already guarantees a
single effective writer.
"""

from __future__ import annotations

import argparse
import importlib


def import_handlers(spec: str):
    """``'module.path:ATTR'`` → ``(config, id_cols)`` (reference
    ``handlers.py:5-8`` uses the same dotted-path convention). The module
    may also export ``ID_COLS`` mapping source name → primary-key column
    (the reference hardcodes ``id``; real tables rarely do)."""
    mod_path, _, attr = spec.partition(":")
    if not attr:
        mod_path, _, attr = spec.rpartition(".")
    module = importlib.import_module(mod_path)
    return getattr(module, attr), getattr(module, "ID_COLS", {})


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--handlers", required=True,
                   help="dotted path to view config: 'pkg.mod:CONFIG'")
    p.add_argument("--tables", required=True,
                   help="directory of source parquet tables")
    p.add_argument("--state", required=True, help="state store root")
    p.add_argument("--feed", required=True,
                   help="notification feed directory (JSON lines)")
    p.add_argument("--checkpoint", default=None,
                   help="stream checkpoint dir (default: <state>/_checkpoint)")
    p.add_argument("--forever", action="store_true",
                   help="follow the feed continuously instead of drain-and-exit")
    p.add_argument("--interval", default="1 second",
                   help="trigger interval in --forever mode")
    args = p.parse_args(argv)

    from qvarn_mr_spark.catalog import Catalog
    from qvarn_mr_spark.operators import (
        IncrementalEngine,
        ParquetStateStore,
        ViewEngine,
    )
    from qvarn_mr_spark.session import get_spark
    from qvarn_mr_spark.streaming import StreamingMaintainer

    spark = get_spark("qvarn-mr-worker")
    config, id_cols = import_handlers(args.handlers)
    cat = Catalog.from_dir(spark, args.tables)
    inc = IncrementalEngine(ViewEngine(cat, config, id_cols=id_cols),
                            ParquetStateStore(spark, args.state))
    changed = inc.resync_changed()
    if changed:
        print(f"resynced: {', '.join(changed)}")
    sm = StreamingMaintainer(inc, args.feed,
                             args.checkpoint or f"{args.state}/_checkpoint")
    if args.forever:
        q = sm.start_forever(args.interval)
        q.awaitTermination()
    else:
        sm.run_available()
        print("feed drained")


if __name__ == "__main__":
    main()
