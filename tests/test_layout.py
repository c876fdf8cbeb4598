"""Skew operators and sink layout: salted joins / two-phase top-k match
their naive forms; partition pruning and shuffle-free bucketed joins show
up in the physical plan."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.operators.skew import salted_join, topk_per_key
from qvarn_mr_spark.plans import count_exchanges, explain_str
from qvarn_mr_spark.sources.writers import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_tables(spark, sf_dir, tables=("events",))["events"]


def test_salted_join_matches_plain_join(spark, events):
    users = (events.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n")))
    plain = events.join(users, "user_id").select("event_id", "n")
    salted = salted_join(events, users, "user_id", salt=8) \
        .select("event_id", "n")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_build_preserving_how(spark, events):
    users = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    for how in ("right", "full", "left_anti", "full_outer"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(events, users, "user_id", salt=8, how=how)


def test_topk_per_key_matches_naive_window(events):
    naive_w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id"))
    naive = (events.withColumn("rn", F.row_number().over(naive_w))
             .filter(F.col("rn") <= 5)
             .select("event_type", "event_id", "rn"))
    fast = topk_per_key(events, ["event_type"], "value", k=5, salt=8,
                        tiebreak=["event_id"]) \
        .select("event_type", "event_id", "rn")
    assert sorted(map(tuple, naive.collect())) == \
        sorted(map(tuple, fast.collect()))


def test_partition_pruning_reaches_scan(spark, events, tmp_path):
    path = str(tmp_path / "ev_part")
    write_partitioned(events, path, ["event_type"])
    df = read_partitioned(spark, path).filter(F.col("event_type") == "click")
    txt = explain_str(df, "formatted")
    assert "PartitionFilters: [isnotnull(event_type" in txt
    got = df.count()
    want = events.filter("event_type = 'click'").count()
    assert got == want > 0


def test_bucketed_join_no_shuffle(spark, events, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    agg = events.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("tv"))
    cnt = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    write_bucketed(agg, "ev_tv", ["user_id"], num_buckets=4,
                   sort_by=["user_id"])
    write_bucketed(cnt, "ev_cnt", ["user_id"], num_buckets=4,
                   sort_by=["user_id"])
    joined = spark.table("ev_tv").join(spark.table("ev_cnt"), "user_id")
    # co-located: both sides pre-bucketed on the join key → zero exchanges
    assert count_exchanges(joined) == 0
    assert joined.count() == agg.count()


# -- Z-order layout ---------------------------------------------------------

def _file_ranges(path, cols):
    """(min, max) per column per parquet data file, from the footers —
    the exact stats a reader's file/row-group skipping uses."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_names = [md.schema.column(i).name
                        for i in range(md.num_columns)]
        rng = {}
        for c in cols:
            ci = schema_names.index(c)
            lo = min(md.row_group(g).column(ci).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(ci).statistics.max
                     for g in range(md.num_row_groups))
            rng[c] = (lo, hi)
        out.append(rng)
    return out


def _hit_fraction(ranges, box):
    hits = sum(1 for r in ranges
               if all(r[c][0] <= hi and r[c][1] >= lo
                      for c, (lo, hi) in box.items()))
    return hits / len(ranges)


def test_zorder_layout_skips_files_on_both_dimensions(spark, tmp_path):
    """A 2-D box filter must intersect few z-ordered files' min/max ranges;
    a hash-shuffled layout of the same rows intersects nearly all. This is
    footer-level evidence — the same stats Spark's parquet reader skips
    row groups with."""
    from qvarn_mr_spark.sources.writers import write_zordered

    n = 200_000
    df = (spark.range(n)
          .select((F.col("id") % 447).alias("x"),
                  F.pmod(F.col("id") * 2654435761, F.lit(100_000)).alias("y"),
                  F.col("id").alias("payload")))
    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], bits=10, num_files=16)
    shuffled = str(tmp_path / "shuffled")
    df.repartition(16).write.parquet(shuffled)

    # ~1/8 of each dimension -> ~1/64 of the plane
    box = {"x": (100, 155), "y": (20_000, 32_500)}
    z_frac = _hit_fraction(_file_ranges(zpath, ["x", "y"]), box)
    s_frac = _hit_fraction(_file_ranges(shuffled, ["x", "y"]), box)
    assert s_frac >= 0.9, f"hash layout unexpectedly clustered: {s_frac}"
    assert z_frac <= 0.5, f"z-order failed to cluster: {z_frac}"
    assert z_frac < s_frac / 2

    # layout changes bytes-on-disk order only, never content
    a = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_zorder_key_validation(spark):
    from qvarn_mr_spark.sources.writers import zorder_key

    df = spark.range(10).select(F.col("id").alias("x"),
                                F.col("id").alias("y"))
    with pytest.raises(ValueError, match=">= 2"):
        zorder_key(df, ["x"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["x", "y"], bits=31)


def test_zorder_handles_timestamps(spark, sf_dir):
    """events.ts is TIMESTAMP_NTZ — the curve key must build on tz-free
    epoch micros (the round-2 regression class)."""
    from qvarn_mr_spark.sources.writers import zorder_key

    ev = load_tables(spark, sf_dir, tables=("events",))["events"]
    z = zorder_key(ev, ["user_id", "ts"], bits=8)
    got = ev.select(z.alias("z")).agg(F.countDistinct("z")).first()[0]
    assert got > 1


def test_zorder_degenerate_inputs(spark, tmp_path):
    """Empty frame / all-NULL z-column: min-max bounds come back None —
    the write must degrade to an unclustered-but-valid write, not raise."""
    from qvarn_mr_spark.sources.writers import write_zordered

    empty = spark.range(0).select(F.col("id").alias("x"),
                                  F.col("id").alias("y"))
    write_zordered(empty, str(tmp_path / "e"), ["x", "y"], num_files=1)
    assert spark.read.parquet(str(tmp_path / "e")).count() == 0

    nulls = spark.range(5).select(
        F.col("id").alias("x"), F.lit(None).cast("double").alias("y"))
    write_zordered(nulls, str(tmp_path / "n"), ["x", "y"], num_files=1)
    assert spark.read.parquet(str(tmp_path / "n")).count() == 5
