"""packing.pack_sequences — two-phase global cumsum + pack assignment."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from qvarn_mr_spark.functions.packing import pack_sequences, pack_summary


def _docs(spark, texts):
    return spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)],
        "doc_id string, text string")


def test_pack_sequences_hand_checked(spark):
    # token counts: 3, 4, 2, 5 — window 4
    df = _docs(spark, ["a b c", "d e f g", "h i", "j k l m n"])
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"],
                         r["pack_first"], r["pack_last"])
           for r in pack_sequences(df, window=4).collect()}
    assert got == {
        "0": (3, 0, 0, 0),    # tokens 0-2 -> pack 0
        "1": (4, 3, 0, 1),    # tokens 3-6 -> straddles packs 0,1
        "2": (2, 7, 1, 2),    # tokens 7-8 -> straddles 1,2
        "3": (5, 9, 2, 3),    # tokens 9-13 -> packs 2,3
    }
    summ = {r["pack_id"]: r["n_docs_starting"]
            for r in pack_summary(pack_sequences(df, window=4)).collect()}
    assert summ == {0: 2, 1: 1, 2: 1}


def test_pack_sequences_matches_naive_global_window(spark, sf_dir):
    """Differential: the two-phase form must equal the single global
    window cumsum on real data."""
    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.text import token_count
    docs = load_tables(spark, sf_dir, tables=("documents",))["documents"]
    got = {r["doc_id"]: (r["start_offset"], r["pack_first"], r["pack_last"])
           for r in pack_sequences(docs, window=256).collect()}

    naive = docs.select(
        F.col("doc_id"),
        F.col("doc_id").cast("long").alias("oid"),
        token_count(F.col("text")).cast("long").alias("n"))
    naive = naive.withColumn(
        "cum", F.sum("n").over(Window.orderBy("oid")))
    want = {}
    for r in naive.collect():
        start = r["cum"] - r["n"]
        pf = start // 256
        pl = max(pf, (r["cum"] - 1) // 256)
        want[r["doc_id"]] = (start, pf, pl)
    assert got == want


def test_pack_sequences_plan_is_partitioned(spark, sf_dir):
    """The corpus-side running sum must be a PARTITIONED window (local per
    range partition); only the metadata-sized prefix table may use the
    single-partition global window."""
    from qvarn_mr_spark.catalog import load_tables
    docs = load_tables(spark, sf_dir, tables=("documents",))["documents"]
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan() \
        .toString()
    # the corpus window carries the _pid partition spec
    assert "_pid" in plan
    # range partitioning of the order key is present (global order phase)
    assert "rangepartitioning" in plan.lower()


def test_inverted_index(spark):
    from qvarn_mr_spark.functions.text import inverted_index
    df = _docs(spark, ["red blue red", "blue green", "red solo"])
    got = {r["term"]: (r["n_docs"], r["postings"])
           for r in inverted_index(df, min_df=1).collect()}
    assert got["red"] == (2, "0,2")
    assert got["blue"] == (2, "0,1")
    assert got["green"] == (1, "1")
    capped = {r["term"] for r in
              inverted_index(df, min_df=2).collect()}
    assert capped == {"red", "blue"}


def test_export_training_shards_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F
    from qvarn_mr_spark.functions.pipeline import export_training_shards
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(10)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        df, out, window=32, shards=4,
        split_weights={"train": 0.8, "val": 0.2})
    m = manifest.collect()
    assert {r["split"] for r in m} <= {"train", "val"}
    assert all(0 <= r["shard"] < 4 for r in m)
    # token conservation: every input token lands in exactly one row
    written = spark.read.parquet(out)
    assert written.count() == 60
    assert written.agg(F.sum("n_tokens")).collect()[0][0] == 600
    # per-split packing is self-contained: offsets restart per split
    for split in ("train", "val"):
        part = written.filter(F.col("split") == split)
        assert part.agg(F.min("start_offset")).collect()[0][0] == 0
    # deterministic re-export
    again = export_training_shards(
        df, str(tmp_path / "shards2"), window=32, shards=4,
        split_weights={"train": 0.8, "val": 0.2})
    assert sorted(map(tuple, manifest.collect())) == \
        sorted(map(tuple, again.collect()))


def test_chunk_documents_hand_checked(spark):
    from qvarn_mr_spark.functions.packing import chunk_documents
    # 10 tokens, window 4, overlap 2 -> stride 2, starts 0,2,4,6 while
    # start <= n - overlap - 1 = 7
    toks = [f"t{i}" for i in range(10)]
    df = _docs(spark, [" ".join(toks)])
    got = sorted((r["chunk_id"], r["n_tokens"], r["chunk_text"])
                 for r in chunk_documents(df, window=4, overlap=2).collect())
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t2 t3 t4 t5"),
        (2, 4, "t4 t5 t6 t7"),
        (3, 4, "t6 t7 t8 t9"),
    ]


def test_chunk_documents_short_and_tail(spark):
    from qvarn_mr_spark.functions.packing import chunk_documents
    # short doc -> exactly one chunk; tail chunk must add >= 1 new token
    df = _docs(spark, ["a b", " ".join(f"x{i}" for i in range(5))])
    rows = chunk_documents(df, window=4, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc["0"]) == 1 and by_doc["0"][0]["chunk_text"] == "a b"
    c1 = sorted(by_doc["1"], key=lambda r: r["chunk_id"])
    assert [r["chunk_text"] for r in c1] == ["x0 x1 x2 x3", "x2 x3 x4"]
    assert [r["n_tokens"] for r in c1] == [4, 3]


def test_chunk_documents_null_text(spark):
    from qvarn_mr_spark.functions.packing import chunk_documents
    df = spark.createDataFrame([("0", None), ("1", "a b")],
                               "doc_id string, text string")
    rows = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
                  for r in chunk_documents(df, window=4, overlap=2).collect())
    # NULL text ≡ empty text: exactly one chunk of the empty token, never
    # a NULL-n_tokens/NULL-text row
    assert rows == [("0", 0, 1, ""), ("1", 0, 2, "a b")]


def test_chunk_documents_covers_every_token(spark, sf_dir):
    from qvarn_mr_spark.functions.packing import chunk_documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    chunks = chunk_documents(docs, window=32, overlap=8)
    # reassembling chunks (dropping each chunk's 8-token overlap head
    # after the first) must reproduce the original token stream exactly
    rows = chunks.collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, parts in per.items():
        toks = []
        for cid in sorted(parts):
            ptoks = parts[cid].split(" ")
            toks.extend(ptoks if cid == 0 else ptoks[8:])
        assert " ".join(toks) == orig[did], did
