"""Measured scale curve for ResourceStore.backfill + migrate
(VERDICT r11 #6): the migration story's two verbs timed at sf0.1 /
sf0.3 / sf1 over the documents table, with untimed per-attempt store
setup (a fresh store per attempt — migrate mutates state, so reruns
must not see a half-versioned table).

Three rows merged into SCALE_CURVES.json:
- ``store_backfill``        — the bulk-ingest write (id-checked);
- ``store_migrate``         — a rename+retype+add step: ONE atomic
                              narrow-projection snapshot rewrite
                              (plan pinned Exchange-free in
                              tests/test_migration.py);
- ``store_migrate_add``     — a purely ADDITIVE step. Documented cost:
                              it rewrites too (this module's design
                              stance is one physical schema — no
                              virtual columns forked from the files;
                              see sources/migration.py docstring), so
                              its alpha should match store_migrate's.

Usage: python tools/migration_curve.py [--runs N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.session import get_spark
from qvarn_mr_spark.sources import ResourceStore
from tools.scale_curves import SCALE_POINTS, fit_alpha

STEP = [("rename", "lang", "language"),
        ("retype", "n_chars", "double"),
        ("add", "stars", "long", 0)]
ADD_STEP = [("add", "quality_bucket", "string", "unscored")]


def measure(spark, d, runs):
    docs = load_tables(spark, d, ["documents"])["documents"].select(
        F.col("doc_id").alias("rid"), "doc_id", "text", "lang",
        "source", "n_chars")
    n = docs.count()
    backfill, migrate, migrate_add = [], [], []
    for attempt in range(runs):
        root = os.path.join(".scaledata",
                            f"mig_curve_{os.path.basename(d)}_{attempt}")
        shutil.rmtree(root, ignore_errors=True)
        rs = ResourceStore(spark, root)
        t0 = time.time()
        rs.backfill("doc", docs, id_col="rid")
        backfill.append(time.time() - t0)
        t0 = time.time()
        rs.migrate("doc", 1, STEP)
        migrate.append(time.time() - t0)
        t0 = time.time()
        rs.migrate("doc", 2, ADD_STEP)
        migrate_add.append(time.time() - t0)
        # sanity: the migrated snapshot answers on the new schema
        cols = set(rs.table("doc").columns)
        assert {"language", "stars", "quality_bucket"} <= cols, cols
        shutil.rmtree(root, ignore_errors=True)
    return (n, round(min(backfill), 3), round(min(migrate), 3),
            round(min(migrate_add), 3))


def main():
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("qvarn-mr-migration-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = {"store_backfill": {}, "store_migrate": {},
            "store_migrate_add": {}}
    for sf, d in SCALE_POINTS:
        n, b, m, ma = measure(spark, d, runs)
        rows["store_backfill"][sf] = b
        rows["store_migrate"][sf] = m
        rows["store_migrate_add"][sf] = ma
        print(f"sf{sf}: n_docs={n} backfill={b}s migrate={m}s "
              f"migrate_add={ma}s", flush=True)

    table = []
    for name, by_sf in rows.items():
        sfs = sorted(by_sf)
        table.append({"query": name,
                      "t": {str(s): by_sf[s] for s in sfs},
                      "alpha_vs_sf": round(
                          fit_alpha(sfs, [by_sf[s] for s in sfs]), 3)})

    out_path = "SCALE_CURVES.json"
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        prev["curves"] = ([r for r in prev.get("curves", [])
                           if r["query"] not in rows]
                          + table)
        payload = prev
    else:
        payload = {"runs_per_point": runs, "curves": table}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)

    print("| query | t(sf0.1) | t(sf0.3) | t(sf1) | alpha vs sf |")
    print("|---|---|---|---|---|")
    for row in table:
        t = row["t"]
        print(f"| {row['query']} | {t['0.1']} | {t['0.3']} | {t['1.0']} |"
              f" {row['alpha_vs_sf']} |")


if __name__ == "__main__":
    main()
