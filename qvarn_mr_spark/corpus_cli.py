"""Corpus-pipeline entry point — run the training-data pass as a job.

The LLM-pipeline sibling of :mod:`qvarn_mr_spark.worker` (which serves
the reference's view-maintenance CLI): one command takes a documents
table from parquet to trainer-ready shards::

    python -m qvarn_mr_spark.corpus_cli \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/shards \
        --min-quality 0.3 --min-tokens 5 \
        [--languages en,de] [--strip-lines-frac 0.5] \
        [--decontaminate /path/eval.parquet] \
        [--window 512 --shards 8] [--stats]

Stages are exactly :func:`qvarn_mr_spark.functions.pipeline.
corpus_prepare` (profile → gates → dedup → split) followed by
:func:`~qvarn_mr_spark.functions.pipeline.export_training_shards`
restricted to the surviving canonical documents; the export manifest
prints as JSON lines (one per written ``(split, shard)`` partition) so
an orchestrator can parse the run result from stdout.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="documents parquet path (doc_id, text[, ...])")
    p.add_argument("--output", required=True,
                   help="output directory for packed shards")
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--languages", default=None,
                   help="comma-separated allowed langs (default: all)")
    p.add_argument("--strip-lines-frac", type=float, default=None,
                   help="CCNet boilerplate strip threshold (fraction)")
    p.add_argument("--line-delimiter", default="\n")
    p.add_argument("--decontaminate", default=None,
                   help="eval-set parquet to decontaminate against")
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--train", type=float, default=0.98)
    p.add_argument("--val", type=float, default=0.01)
    p.add_argument("--test", type=float, default=0.01)
    p.add_argument("--salt", default="corpus")
    p.add_argument("--stats", action="store_true",
                   help="also print the gate-accounting summary line")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from qvarn_mr_spark.functions.pipeline import (corpus_prepare,
                                                   corpus_stats,
                                                   export_training_shards)
    from qvarn_mr_spark.session import get_spark

    spark = get_spark("qvarn-mr-corpus")
    docs = spark.read.parquet(args.input)
    weights = {"train": args.train, "val": args.val, "test": args.test}
    prepared = corpus_prepare(
        docs, "doc_id", "text",
        min_quality=args.min_quality,
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        languages=(args.languages.split(",") if args.languages else None),
        strip_lines_min_frac=args.strip_lines_frac,
        line_delimiter=args.line_delimiter,
        decontaminate_against=(spark.read.parquet(args.decontaminate)
                               if args.decontaminate else None),
        jaccard_threshold=args.jaccard_threshold,
        split_weights=weights, salt=args.salt)
    if args.stats:
        for row in corpus_stats(docs, prepared).collect():
            print(json.dumps({"stat": row.asDict()}, default=str))
    survivors = docs.join(prepared.select("doc_id"), "doc_id", "left_semi")
    manifest = export_training_shards(
        survivors.select("doc_id", "text"), args.output,
        window=args.window, shards=args.shards,
        split_weights=weights, salt=args.salt)
    for row in manifest.collect():
        print(json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
