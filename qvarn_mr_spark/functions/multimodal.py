"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's only binary surface is the file subresource (blob + content
type, ``/root/reference/qvarnmr/clients/qvarn.py:120-122,193-200``). For an
LLM-data pipeline the same idea scales up: media travels as a ``binary``
column with a typed metadata struct, and every transform is an Arrow-batched
``mapInPandas`` so payloads never round-trip through driver memory.

The actual codec step is STUBBED — the image/audio libraries are not in this
container — behind ``decoder=`` hooks: pass ``fake_decode`` (deterministic,
hash-derived, used by tests) or a real function (e.g. PIL/librosa) in
production; the default raises ``NotImplementedError``. Everything Spark-side
is real and tested: schema, partition-preserving batch iteration, Arrow batch
shapes, and the feature-vector contract.

Scale notes: media rows are large — the partition sizing that matters is
bytes, not rows (``spark.sql.files.maxPartitionBytes``); transforms are
narrow (no shuffle); feature extraction emits small fixed-dim vectors, so
the post-extract stage re-partitions freely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried alongside every media payload
MEDIA_META_DDL = ("kind string, format string, width int, height int, "
                  "sample_rate int, duration_ms long")

MEDIA_DDL = f"media_id long, payload binary, meta struct<{MEDIA_META_DDL}>"

FEATURE_DIM = 16


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated md5 bytes) — the
    stand-in for a real binary ingest, sized/typed like one."""
    def row(i: int):
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (8 + i % 8)
        kind = ("image", "audio", "video")[i % 3]
        return (i, bytearray(payload),
                {"kind": kind, "format": {"image": "png", "audio": "wav",
                                          "video": "mp4"}[kind],
                 "width": 64 + i % 32 if kind != "audio" else None,
                 "height": 48 + i % 32 if kind != "audio" else None,
                 "sample_rate": 16000 if kind == "audio" else None,
                 "duration_ms": 1000 + i * 10 if kind != "image" else None})
    return spark.createDataFrame([row(i) for i in range(n)], MEDIA_DDL)


def default_decode(payload: bytes, meta: dict) -> Any:
    raise NotImplementedError(
        "real media decoding needs PIL/av/librosa — not present in this "
        "environment; pass decoder=fake_decode or a real codec function")


def fake_decode(payload: bytes, meta: dict) -> bytes:
    """Deterministic decode stub: 'decoded' = sha256 of payload. Stands in
    for pixel/sample buffers so the pipeline shape is testable."""
    return hashlib.sha256(payload).digest()


def extract_features(df: DataFrame, payload_col: str = "payload",
                     decoder: Callable = default_decode) -> DataFrame:
    """Decode + featurize each media row → ``feature array<double>``.

    ``mapInPandas``: Arrow-batched, partition-preserving, no shuffle; the
    Python boundary is paid once per batch, not per row. Output keeps
    ``media_id`` + ``meta`` and adds a FEATURE_DIM-dim unit-normalized
    vector (deterministic for the fake decoder)."""
    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)
    out_ddl = (f"media_id long, meta struct<{MEDIA_META_DDL}>, "
               f"feature array<double>")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, meta in zip(pdf[payload_col], pdf["meta"]):
                decoded = decoder(bytes(payload), meta)
                h = hashlib.sha256(decoded).digest()
                vec = [h[i] / 255.0 for i in range(FEATURE_DIM)]
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                feats.append([v / norm for v in vec])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "meta": pdf["meta"], "feature": feats})

    return df.mapInPandas(batches, out_ddl)


def frame_sample(df: DataFrame, every_ms: int = 500,
                 payload_col: str = "payload") -> DataFrame:
    """Video → frame rows ``(media_id, frame_ts_ms, frame)``.

    The frame *extraction* is stubbed (frame = md5(payload ‖ ts), a real
    impl decodes with av/ffmpeg); the Spark plumbing is the real pattern:
    one input row fans out to duration/every_ms rows inside ``mapInPandas``,
    which keeps the fan-out distributed and memory-bounded per batch."""
    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)
    out_ddl = "media_id long, frame_ts_ms long, frame binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, tss, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf[payload_col],
                                          pdf["meta"]):
                if meta["kind"] != "video" or not meta["duration_ms"]:
                    continue
                for ts in range(0, int(meta["duration_ms"]), every_ms):
                    ids.append(mid)
                    tss.append(ts)
                    frames.append(hashlib.md5(
                        bytes(payload) + ts.to_bytes(8, "big")).digest())
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_ts_ms": pd.Series(tss, dtype="int64"),
                                "frame": frames})

    return df.filter(F.col("meta.kind") == "video").mapInPandas(batches, out_ddl)
