"""Sequence packing — assign documents to fixed-size training windows.

The standard LLM pretraining layout: concatenate the corpus in a stable
order and chunk the token stream into fixed ``window``-token sequences.
Per document this yields its global token ``start_offset`` and the range of
packs it lands in (``pack_first``..``pack_last`` — a doc longer than the
window, or straddling a boundary, spans several).

The naive expression of the global running sum — ``sum() OVER (ORDER BY
id)`` with no PARTITION BY — collapses the whole corpus into ONE task and is
the canonical 100 TB anti-pattern. This implements the scalable two-phase
form instead:

1. ``repartitionByRange`` on the order key (ranges are globally ordered);
2. a per-partition-local running sum (window partitioned by
   ``spark_partition_id`` — parallel, each partition independent);
3. per-partition totals (one row per partition, metadata-sized) prefix-summed
   and joined back (broadcast).

Same result as the global window, but the widest single task holds one
range partition, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", window: int = 512,
                   order_cast: str = "long") -> DataFrame:
    """Per-document packing table ``(doc_id, n_tokens, start_offset,
    pack_first, pack_last)`` for ``window``-token training sequences,
    concatenating documents in ``id_col`` (numeric) order."""
    from qvarn_mr_spark.functions.text import token_count

    base = df.select(
        F.col(id_col).cast(order_cast).alias("_oid"),
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"))
    base = (base.repartitionByRange("_oid")
            .withColumn("_pid", F.spark_partition_id()))

    local = base.withColumn(
        "_local_cum",
        F.sum("n_tokens").over(
            Window.partitionBy("_pid").orderBy("_oid")))

    # one row per partition — prefix-summing this with a global window is
    # metadata-sized work, not a corpus shuffle
    totals = local.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    prefix = totals.withColumn(
        "_prefix",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_pid")
                .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0))).select("_pid", "_prefix")

    cum = F.col("_local_cum") + F.col("_prefix")
    start = cum - F.col("n_tokens")
    pack_first = F.floor(start / F.lit(float(window))).cast("long")
    pack_last = F.greatest(
        pack_first,
        F.floor((cum - 1) / F.lit(float(window))).cast("long"))
    return (local.join(F.broadcast(prefix), "_pid")
            .select("doc_id", "n_tokens",
                    start.cast("long").alias("start_offset"),
                    pack_first.alias("pack_first"),
                    pack_last.alias("pack_last")))


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 32,
                    overlap: int = 8) -> DataFrame:
    """Overlapping fixed-size token-window chunking — the RAG /
    context-window preprocessing staple: each document yields chunks of up
    to ``window`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens (stride ``window - overlap``). A chunk is emitted
    only if it contributes at least one token beyond the previous chunk's
    overlap, so short documents produce exactly one chunk and the last
    chunk is never fully contained in its predecessor.

    Returns ``(doc_id, chunk_id, n_tokens, chunk_text)`` with
    ``chunk_id`` dense from 0 per document.

    Scale shape: pure Column expressions — ``split`` → ``sequence`` →
    ``explode`` → ``slice``/``array_join`` — scan-stage work inside
    whole-stage codegen. No shuffle, no Python boundary; output rows ≈
    corpus tokens / stride, produced streaming per input partition."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got "
                         f"overlap={overlap} window={window}")
    step = window - overlap
    # NULL text behaves as empty (one empty chunk) — without the coalesce,
    # split(NULL) is NULL, _n goes -1/NULL, and greatest() floors the
    # sequence to a bogus single chunk with NULL n_tokens/chunk_text while
    # the DuckDB oracle's range(NULL) emits nothing
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
    d = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"),
                  F.size(toks).alias("_n"))
    # starts 0, step, 2·step … while the chunk adds ≥1 token past the
    # shared overlap: start <= n - overlap - 1 (floor at 0 ⇒ one chunk)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - F.lit(overlap + 1), F.lit(0)),
        F.lit(step))
    d = d.select("doc_id", "_toks", "_n", F.explode(starts).alias("_start"))
    return d.select(
        "doc_id",
        (F.col("_start") / F.lit(step)).cast("long").alias("chunk_id"),
        F.least(F.lit(window), F.col("_n") - F.col("_start"))
        .cast("long").alias("n_tokens"),
        F.array_join(
            F.slice("_toks", F.col("_start") + 1, F.lit(window)),
            " ").alias("chunk_text"))


def pack_summary(packed: DataFrame, window: int = 512) -> DataFrame:
    """Pack-level occupancy: docs starting in each pack and whether the
    pack is fully covered (diagnostic for padding waste)."""
    return (packed.groupBy("pack_first")
            .agg(F.count(F.lit(1)).alias("n_docs_starting"),
                 F.sum("n_tokens").alias("tokens_starting"))
            .withColumnRenamed("pack_first", "pack_id"))
