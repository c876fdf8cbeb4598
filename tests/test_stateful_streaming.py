"""Streaming event-time operators: watermarked windows match their batch
twin; applyInPandasWithState sessionization carries state across batches."""

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.catalog import load_tables
from qvarn_mr_spark.streaming import (dedup_stream, sessionize_stream,
                                      windowed_counts)

EV_DDL = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """The driver's events table rewritten as a streamable parquet dir
    (ts already converted ns→timestamp)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_tables(spark, sf_dir, tables=("events",))["events"] \
        .coalesce(2).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_stream_matches_batch(spark, events_dir, tmp_path):
    stream = spark.readStream.schema(EV_DDL).parquet(events_dir)
    got = []
    q = (windowed_counts(stream, window="1 hour", watermark="2 hours")
         .writeStream.outputMode("complete")
         .foreachBatch(lambda b, _: got.extend(b.collect()) if not b.isEmpty() else None)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    batch = spark.read.schema(EV_DDL).parquet(events_dir)
    expected = {tuple(r) for r in windowed_counts(batch).collect()}
    assert {tuple(r) for r in got} == expected
    assert len(got) > 100


@pytest.mark.sweep
def test_sessionize_stream_state_across_batches(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    ck = str(tmp_path / "ck")

    def emit(name, rows):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"tmp_{name}"))
        # move files into the feed dir so the file source sees one new file
        import glob
        import shutil
        for i, f in enumerate(glob.glob(str(tmp_path / f"tmp_{name}" / "*.parquet"))):
            shutil.move(f, str(feed / f"{name}-{i}.parquet"))

    def run(collected):
        stream = spark.readStream.schema("user_id long, ts timestamp") \
            .parquet(str(feed))
        q = (sessionize_stream(stream, gap_minutes=30)
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _: collected.extend(b.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    from datetime import datetime

    def T(hhmm):
        return datetime.fromisoformat(f"2024-01-01 {hhmm}:00")

    def key(rows):
        return {(r["user_id"], r["n_events"],
                 r["session_start"] // 1_000_000 % 86400 // 60) for r in rows}

    emit("b1", [(1, T("10:00")), (1, T("10:10")),
                (1, T("11:30")),       # gap > 30 min → 2nd session
                (2, T("10:00"))])
    got1 = []
    run(got1)
    # user 1's first session closes by gap; user 2's closes by event-time
    # timer (watermark reaches 11:30 > 10:00+gap). user 1's 11:30 session
    # stays open in state.
    assert key(got1) == {(1, 2, 600), (2, 1, 600)}   # starts at minute 600

    # next batch: user 1 continues within gap (11:40); user 2 starts anew
    emit("b2", [(1, T("11:40")), (2, T("12:00"))])
    got2 = []
    run(got2)
    assert got2 == []                 # everything still open

    # third batch: user 1 exceeds gap → the session merged ACROSS b1/b2
    # closes with start 11:30 (minute 690) and 2 events
    emit("b3", [(1, T("12:30"))])
    got3 = []
    run(got3)
    assert key(got3) == {(1, 2, 690)}


def test_dedup_stream_first_seen_across_batches(spark, tmp_path):
    """Streaming exact dedup: state persists across micro-batches — a
    duplicate arriving in a later batch is dropped; survivors are exactly
    one doc per distinct content fingerprint (the batch exact_dedup
    group set)."""
    import glob
    import shutil

    feed = tmp_path / "docs"
    feed.mkdir()
    ck = str(tmp_path / "ck")
    DDL = "doc_id long, text string"

    def emit(name, rows):
        df = spark.createDataFrame(rows, DDL)
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"tmp_{name}"))
        for i, f in enumerate(
                glob.glob(str(tmp_path / f"tmp_{name}" / "*.parquet"))):
            shutil.move(f, str(feed / f"{name}-{i}.parquet"))

    def run(collected):
        stream = spark.readStream.schema(DDL).parquet(str(feed))
        q = (dedup_stream(stream, text_col="text")
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _: collected.extend(b.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    emit("b1", [(1, "the quick brown fox"),
                (2, "THE  QUICK  BROWN  FOX"),   # dup after normalization
                (3, "something else")])
    got1 = []
    run(got1)
    assert {r["doc_id"] for r in got1} in ({1, 3}, {2, 3})  # one per fp

    # cross-batch duplicate dropped by state; new content passes
    emit("b2", [(4, "the quick brown fox"),
                (5, "brand new text")])
    got2 = []
    run(got2)
    assert {r["doc_id"] for r in got2} == {5}

    # survivors == one per distinct fingerprint of everything fed
    from qvarn_mr_spark.functions.dedup import exact_dedup
    batch = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "THE  QUICK  BROWN  FOX"),
         (3, "something else"), (4, "the quick brown fox"),
         (5, "brand new text")], DDL)
    n_groups = exact_dedup(batch, "doc_id", "text").count()
    assert len(got1) + len(got2) == n_groups == 3


def test_stream_static_broadcast_enrichment(spark, events_dir, tmp_path):
    """Stream–static join: a micro-batch stream enriched against a static
    broadcast dimension (the standard fact-stream + dim-table pipeline
    shape) aggregates identically to its batch twin. The static side is
    planned as a broadcast per micro-batch — no stream-side shuffle."""
    dim = spark.range(0, 10000).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).alias("cohort"))

    def enriched_counts(df):
        return (df.join(F.broadcast(dim), "user_id")
                .groupBy("cohort")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.round(F.sum("value"), 2).alias("total")))

    stream = spark.readStream.schema(EV_DDL).parquet(events_dir)
    got = []
    q = (enriched_counts(stream)
         .writeStream.outputMode("complete")
         .foreachBatch(lambda b, _: got.clear() or got.extend(b.collect()))
         .option("checkpointLocation", str(tmp_path / "ck_enrich"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    batch = spark.read.schema(EV_DDL).parquet(events_dir)
    expected = {tuple(r) for r in enriched_counts(batch).collect()}
    assert {tuple(r) for r in got} == expected
    assert len(got) == 5


def test_latest_per_key_stream_state_across_batches(spark, tmp_path):
    """Stateful newest-wins: the stored latest survives micro-batch
    boundaries, late rows older than it emit nothing, and the final
    per-key state matches the batch window_latest semantics."""
    from qvarn_mr_spark.streaming import latest_per_key_stream

    _latest_per_key_lifecycle(spark, tmp_path, latest_per_key_stream)


def test_latest_per_key_stream_tws_differential(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas twin must pass the exact
    same lifecycle when the runtime supports it (API + google.protobuf);
    skipped with the capability reason otherwise."""
    from qvarn_mr_spark.streaming.stateful import (
        latest_per_key_stream_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("transformWithStateInPandas unavailable: needs Spark "
                    ">= 4 with the google.protobuf Python package — "
                    "closed as won't-fix in this sandbox (SCALE.md "
                    "'Known trade-offs'; no pip, no vendorable wheel, "
                    "and a stub would corrupt the JVM state protocol); "
                    "the test stays for protobuf-equipped environments")
    _latest_per_key_lifecycle(spark, tmp_path, latest_per_key_stream_tws)


def _latest_per_key_lifecycle(spark, tmp_path, op):
    feed = tmp_path / "feed"
    feed.mkdir()
    ck = str(tmp_path / "ck")

    def emit(name, rows):
        import glob
        import shutil
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"tmp_{name}"))
        for i, f in enumerate(glob.glob(
                str(tmp_path / f"tmp_{name}" / "*.parquet"))):
            shutil.move(f, str(feed / f"{name}-{i}.parquet"))

    def run(collected):
        stream = spark.readStream \
            .schema("user_id long, ts timestamp, value double") \
            .parquet(str(feed))
        q = (op(stream)
             .writeStream.outputMode("update")
             .foreachBatch(lambda b, _: collected.extend(b.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    from datetime import datetime

    def T(hhmm):
        return datetime.fromisoformat(f"2024-01-01 {hhmm}:00")

    emit("b1", [(1, T("10:00"), 1.0), (1, T("10:30"), 2.0),
                (2, T("09:00"), 5.0)])
    got1 = []
    run(got1)
    assert {(r["user_id"], r["value"]) for r in got1} == {(1, 2.0), (2, 5.0)}

    # batch 2: a LATE row for user 1 (older than stored latest -> no
    # emission), a genuinely newer row for user 2, and a new key
    emit("b2", [(1, T("10:15"), 9.0), (2, T("11:00"), 7.0),
                (3, T("08:00"), 3.0)])
    got2 = []
    run(got2)
    assert {(r["user_id"], r["value"]) for r in got2} == {(2, 7.0), (3, 3.0)}


def test_corpus_gate_stream_matches_batch(spark, tmp_path):
    """Streaming corpus gate (profile gates + first-seen fp dedup) must
    agree with the batch gates: same surviving fingerprint set, every
    survivor passes the gates, and a duplicate arriving in a later
    micro-batch loses to the first-seen copy."""
    import glob
    import shutil

    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream
    from qvarn_mr_spark.functions.text import (fingerprint, lang_guess,
                                               quality_score, token_count)

    feed = tmp_path / "gatefeed"
    feed.mkdir()

    def emit(name, rows):
        df = spark.createDataFrame(rows, "doc_id string, text string")
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"tmp_{name}"))
        for i, f in enumerate(glob.glob(
                str(tmp_path / f"tmp_{name}" / "*.parquet"))):
            shutil.move(f, str(feed / f"{name}-{i}.parquet"))

    good = ("the cat and the dog is in the house and it was the best "
            "of times for all of the people that it knew")
    b1 = [("1", good), ("2", "x y"),                       # 2: too short
          ("3", "?? !! ?? !! ?? !!")]                      # 3: low quality
    b2 = [("4", good.upper() + "!!"),                      # dup of 1 (fp)
          ("5", "a man of the people is not a myth and the story "
                "was told for all of the times that it was needed")]
    emit("b1", b1)

    got = []
    ck = str(tmp_path / "gateck")

    def run():
        stream = spark.readStream.schema("doc_id string, text string") \
            .parquet(str(feed))
        q = (corpus_gate_stream(stream, min_quality=0.3, min_tokens=5)
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _: got.extend(b.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    emit("b2", b2)
    run()

    all_rows = b1 + b2
    batch = spark.createDataFrame(all_rows, "doc_id string, text string") \
        .select("doc_id", "text",
                token_count("text").alias("n_tokens"),
                quality_score("text").alias("q"),
                lang_guess("text").alias("lang"),
                fingerprint("text").alias("fp")) \
        .filter((F.col("q") >= 0.3) & F.col("n_tokens").between(5, 100_000))
    want_fps = {r["fp"] for r in batch.collect()}
    got_by_fp = {}
    for r in got:
        got_by_fp.setdefault(r["fp"], []).append(r)
    assert set(got_by_fp) == want_fps
    # exactly one survivor per fingerprint, and the FIRST batch's copy
    # wins over the later duplicate
    assert all(len(v) == 1 for v in got_by_fp.values())
    survivors = {r["doc_id"] for r in got}
    assert "1" in survivors and "4" not in survivors
    assert "5" in survivors
    # gated rows never surface
    assert survivors.isdisjoint({"2", "3"})


def test_corpus_gate_stream_watermarked_ttl(spark, tmp_path):
    """The watermark-TTL'd form: within the watermark a later duplicate
    still drops; the state is event-time-bounded (the unbounded-ingest
    configuration), and gates still apply."""
    import glob
    import shutil
    from datetime import datetime

    from qvarn_mr_spark.functions.pipeline import corpus_gate_stream

    feed = tmp_path / "wmfeed"
    feed.mkdir()
    DDL = "doc_id string, text string, ts timestamp"

    def emit(name, rows):
        df = spark.createDataFrame(rows, DDL)
        df.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"tmp_{name}"))
        for i, f in enumerate(glob.glob(
                str(tmp_path / f"tmp_{name}" / "*.parquet"))):
            shutil.move(f, str(feed / f"{name}-{i}.parquet"))

    def T(hhmm):
        return datetime.fromisoformat(f"2024-01-01 {hhmm}:00")

    good = ("the cat and the dog is in the house and it was the best "
            "of times for all of the people that it knew")
    got = []
    ck = str(tmp_path / "wmck")

    def run():
        stream = spark.readStream.schema(DDL).parquet(str(feed))
        q = (corpus_gate_stream(stream, min_quality=0.3, min_tokens=5,
                                watermark="1 hour", ts_col="ts")
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, _: got.extend(b.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    emit("b1", [("1", good, T("10:00")), ("2", "x", T("10:00"))])
    run()
    # in-watermark duplicate (different id, same normalized content) drops
    emit("b2", [("3", good.upper() + "!!", T("10:30"))])
    run()
    survivors = {r["doc_id"] for r in got}
    assert survivors == {"1"}
    assert all("ts" in r.asDict() for r in got)


def test_tws_processor_lifecycle_with_fake_state():
    """Runtime-free differential for the transformWithStateInPandas
    processor: StatefulProcessor imports without google.protobuf (only
    the state-server protocol needs it at stream start), so the exact
    per-key lifecycle the gated streaming differential would exercise —
    first-write emits, late row is silent, newer row re-emits — is
    driven here directly against a fake ValueState. Keeps the tws logic
    pinned in environments (like this one) where the stream runtime
    can't start."""
    import pandas as pd

    from qvarn_mr_spark.streaming.stateful import latest_processor_cls

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

    def T(hhmm):
        return pd.Timestamp(f"2024-01-01 {hhmm}:00")

    def batch(rows):
        return [pd.DataFrame({"_ts": [T(t) for t, _ in rows],
                              "_value": [v for _, v in rows]})]

    proc = latest_processor_cls()()
    handle = FakeHandle()
    proc.init(handle)

    def us(hhmm):
        return int(T(hhmm).value) // 1000

    # batch 1: two rows for the key -> one emission with the newest
    out1 = list(proc.handleInputRows(
        (1,), batch([("10:00", 1.0), ("10:30", 2.0)]), None))
    assert len(out1) == 1
    assert out1[0].iloc[0].tolist() == [1, us("10:30"), 2.0]
    # state survives the batch boundary
    assert handle.states["latest"].get() == (us("10:30"), 2.0)

    # batch 2: LATE row (older than stored latest) -> nothing emitted,
    # state untouched — the exact semantics the GroupState twin pins in
    # test_latest_per_key_stream_state_across_batches
    out2 = list(proc.handleInputRows(
        (1,), batch([("10:15", 9.0)]), None))
    assert out2 == []
    assert handle.states["latest"].get() == (us("10:30"), 2.0)

    # batch 3: genuinely newer row -> re-emit and advance state
    out3 = list(proc.handleInputRows(
        (1,), batch([("11:00", 7.0)]), None))
    assert len(out3) == 1
    assert out3[0].iloc[0].tolist() == [1, us("11:00"), 7.0]
    proc.close()
