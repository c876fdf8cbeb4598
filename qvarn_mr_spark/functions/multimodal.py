"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's only binary surface is the file subresource (blob + content
type, ``/root/reference/qvarnmr/clients/qvarn.py:120-122,193-200``). For an
LLM-data pipeline the same idea scales up: media travels as a ``binary``
column with a typed metadata struct, and every transform is an Arrow-batched
``mapInPandas`` so payloads never round-trip through driver memory.

Codec policy: formats needing external libs (PNG/JPEG/MP4) stay STUBBED
behind ``decoder=`` hooks — pass ``fake_decode`` (deterministic, hash-derived)
or a real function (e.g. PIL/av) in production; the default raises
``NotImplementedError``. Formats the stdlib can decode are REAL:
``stdlib_decode`` parses WAV (``wave`` module → raw PCM frames) and binary
PPM/PGM (header parse → pixel raster), so one decode path runs on genuine
media bytes end-to-end. Everything Spark-side is real and tested: schema,
partition-preserving batch iteration, Arrow batch shapes, and the
feature-vector contract.

Scale notes: media rows are large — the partition sizing that matters is
bytes, not rows (``spark.sql.files.maxPartitionBytes``); transforms are
narrow (no shuffle); feature extraction emits small fixed-dim vectors, so
the post-extract stage re-partitions freely.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


def synthetic_wav_bytes(n_samples: int = 1600, sample_rate: int = 16000,
                        seed: int = 0) -> bytes:
    """A real, spec-compliant mono 16-bit PCM WAV file (stdlib ``wave``
    writer) with deterministic hash-derived samples — actual media bytes
    for the decode path, no codec libs needed."""
    rnd = hashlib.sha256(f"wav-{seed}".encode()).digest()
    frames = b"".join(
        struct.pack("<h", int.from_bytes(rnd[(2 * i) % 31:(2 * i) % 31 + 2],
                                         "little") - 32768)
        for i in range(n_samples))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def synthetic_ppm_bytes(width: int = 8, height: int = 8,
                        seed: int = 0) -> bytes:
    """A real binary PPM (P6) image with deterministic hash-derived pixels."""
    need = width * height * 3
    rnd = hashlib.sha256(f"ppm-{seed}".encode()).digest()
    return (f"P6\n# synthetic\n{width} {height}\n255\n".encode()
            + (rnd * (need // len(rnd) + 1))[:need])


def _pnm_raster(data: bytes) -> bytes:
    """Parse a binary PPM/PGM header and return the raw raster bytes."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(data):
            if data[pos:pos + 1].isspace():
                pos += 1
            elif data[pos:pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        return data[start:pos]

    magic = token()
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic={magic!r}")
    width, height, maxval = int(token()), int(token()), int(token())
    pos += 1  # exactly one whitespace byte separates maxval from the raster
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels * (1 if maxval < 256 else 2)
    raster = data[pos:pos + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    return raster


def stdlib_decode(payload: bytes, meta: dict) -> bytes:
    """REAL decode for stdlib-decodable formats: WAV → raw PCM frames via
    ``wave``, binary PPM/PGM → raw pixel raster via header parse. Formats
    needing external codec libs still raise (see ``default_decode``) —
    this makes one end-to-end decode path genuine in this container."""
    payload = bytes(payload)
    fmt = (meta or {}).get("format")
    if payload[:4] == b"RIFF" or fmt == "wav":
        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.readframes(w.getnframes())
    if payload[:2] in (b"P5", b"P6") or fmt in ("ppm", "pgm"):
        return _pnm_raster(payload)
    return default_decode(payload, meta)


def synthetic_media_real(spark, n: int = 32) -> DataFrame:
    """Like :func:`synthetic_media` but every payload is genuinely decodable
    by :func:`stdlib_decode` — alternating real WAV audio and PPM images."""
    def row(i: int):
        if i % 2:
            payload = synthetic_wav_bytes(n_samples=400 + i * 8, seed=i)
            meta = {"kind": "audio", "format": "wav", "width": None,
                    "height": None, "sample_rate": 16000,
                    "duration_ms": (400 + i * 8) * 1000 // 16000}
        else:
            w, h = 8 + i % 8, 6 + i % 6
            payload = synthetic_ppm_bytes(w, h, seed=i)
            meta = {"kind": "image", "format": "ppm", "width": w,
                    "height": h, "sample_rate": None, "duration_ms": None}
        return (i, bytearray(payload), meta)
    return spark.createDataFrame([row(i) for i in range(n)], MEDIA_DDL)


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


#: real-signal feature vector layout (media_signal_features)
SIGNAL_FEATURE_DIM = 8


def image_resize(df: DataFrame, out_w: int, out_h: int,
                 payload_col: str = "payload",
                 decoder: Callable = stdlib_decode) -> DataFrame:
    """REAL image resize (nearest neighbor) over decoded rasters — decode
    PPM/PGM → numpy index gather → re-encode as binary PPM/PGM with
    updated meta. Non-image rows pass through untouched.

    ``mapInPandas`` + numpy per batch: the resize is one fancy-index
    gather per image, no Python-per-pixel loop; narrow (no shuffle), so
    at scale it runs inside the scan stage and the output partition
    bytes shrink by (out_w*out_h)/(w*h)."""
    import numpy as np

    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for payload, meta in zip(pdf[payload_col], pdf["meta"]):
                if meta["kind"] != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                raster = decoder(bytes(payload), meta)
                w, h = int(meta["width"]), int(meta["height"])
                c = len(raster) // (w * h)
                arr = np.frombuffer(raster, dtype=np.uint8) \
                    .reshape(h, w, c)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = arr[yi][:, xi]
                magic = b"P6" if c == 3 else b"P5"
                head = magic + f"\n{out_w} {out_h}\n255\n".encode()
                payloads.append(bytearray(head + small.tobytes()))
                m = dict(meta)
                m["width"], m["height"] = out_w, out_h
                metas.append(m)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "payload": payloads, "meta": metas})

    return df.mapInPandas(batches, MEDIA_DDL)


def media_signal_features(df: DataFrame, payload_col: str = "payload",
                          decoder: Callable = stdlib_decode) -> DataFrame:
    """REAL signal features from decoded media (not hash placeholders):

    - audio (16-bit PCM): RMS, zero-crossing rate, peak, mean |x| — all
      normalized to [-1, 1] full scale — then zero padding;
    - image (8-bit raster): per-channel mean (up to 3), overall std,
      aspect ratio, channel count, zero padding.

    Fixed ``SIGNAL_FEATURE_DIM`` layout, first slot = kind tag (0 audio,
    1 image). Arrow-batched numpy per batch; narrow."""
    import numpy as np

    from qvarn_mr_spark.session import ship_package
    ship_package(df.sparkSession)
    out_ddl = (f"media_id long, meta struct<{MEDIA_META_DDL}>, "
               f"feature array<double>")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, meta in zip(pdf[payload_col], pdf["meta"]):
                decoded = decoder(bytes(payload), meta)
                if meta["kind"] == "audio":
                    x = np.frombuffer(decoded, dtype="<i2") \
                        .astype(np.float64) / 32768.0
                    zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) \
                        if len(x) > 1 else 0.0
                    v = [0.0,
                         float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                         zc,
                         float(np.max(np.abs(x))) if len(x) else 0.0,
                         float(np.mean(np.abs(x))) if len(x) else 0.0]
                else:
                    w, h = int(meta["width"]), int(meta["height"])
                    c = len(decoded) // (w * h)
                    arr = np.frombuffer(decoded, dtype=np.uint8) \
                        .reshape(h, w, c).astype(np.float64) / 255.0
                    chan = [float(arr[:, :, i].mean())
                            for i in range(min(c, 3))]
                    chan += [0.0] * (3 - len(chan))
                    v = [1.0, *chan, float(arr.std()), w / h, float(c)]
                v += [0.0] * (SIGNAL_FEATURE_DIM - len(v))
                feats.append([round(x, 9) for x in v])
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "meta": pdf["meta"], "feature": feats})

    return df.mapInPandas(batches, out_ddl)
