"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``BINARY`` columns next to a typed
metadata struct; decode / feature-extract runs as an Arrow-batched
pandas iterator over ``mapInPandas`` so the heavy per-item work stays
vectorized and partition-parallel (one Python worker per partition,
Arrow transfer both ways — never per-row Python).

The decode step is REAL for the three dependency-free classic formats
— PNG (zlib inflate + filter reconstruction), 24-bit BMP, PCM-16 WAV —
implemented from the public specs in :mod:`.codecs`. Payloads that are
none of those (or malformed) fall back to deterministic byte
arithmetic (``_raw_features``), so every row yields a feature record
and the fallback twin is expressible in the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import decode_media

FEATURE_SCHEMA = (
    "doc_id bigint, format string, n_bytes int, checksum bigint, head string, "
    "width int, height int, channels int, sample_rate int, n_frames int, "
    "mean_q3 bigint"
)


def binary_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal-shaped table from text rows: (id, payload
    BINARY, meta STRUCT<mime,n_bytes>). Stands in for an image/audio
    ingest table at the exact schema the real pipeline would use."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def _checksum(payload: bytes) -> int:
    c = 0
    for b in payload[:4096]:
        c = (c * 131 + b) % (1 << 32)
    return c


def _raw_features(payload: bytes) -> dict:
    """Deterministic fallback for non-media payloads: byte stats only.

    Stable across runs and parallelism levels, and replicable in plain
    SQL — the DuckDB oracle folds the identical arithmetic. The fake
    width/height keep round-2 behavior for raw payloads."""
    checksum = _checksum(payload)
    return {
        "format": "raw",
        "width": (checksum % 640) + 1,
        "height": ((checksum // 640) % 480) + 1,
        "channels": 0,
        "sample_rate": 0,
        "n_frames": 0,
        "mean_q3": 0,
    }


def _decode(payload: bytes) -> dict:
    try:
        feats = decode_media(payload)
    except Exception:  # malformed media (struct/zlib/index errors) degrades to raw stats
        feats = _raw_features(payload)
    feats["n_bytes"] = len(payload)
    feats["checksum"] = _checksum(payload)
    feats["head"] = payload[:8].hex()
    return feats


def extract_features(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Batches arrive as Arrow-backed pandas DataFrames; the codec runs
    per item inside the batch (decode is inherently per-item), but
    transfer and scheduling are batched.
    """
    cols = [f.split()[0] for f in FEATURE_SCHEMA.split(", ")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_decode)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[cols]

    return mm.mapInPandas(batches, schema=FEATURE_SCHEMA)
