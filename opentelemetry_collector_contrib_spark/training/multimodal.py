"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``BINARY`` columns next to a typed
metadata struct; decode / feature-extract runs as an Arrow-batched
pandas iterator over ``mapInPandas`` so the heavy per-item work stays
vectorized and partition-parallel (one Python worker per partition,
Arrow transfer both ways — never per-row Python).

The decode step itself is STUBBED deterministically (no image/audio
libs in this container): ``_fake_decode`` derives features from the raw
bytes (length + byte checksum + leading bytes), so the Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested
while the codec is swappable (replace ``_fake_decode`` with PIL/ffmpeg
calls in production).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, checksum bigint, head string, width int, height int"
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


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec (PIL.Image.open etc.).

    Raises nothing and uses only the bytes, so results are stable
    across runs and parallelism levels. Replace with a real decoder in
    production; keep the output contract (dict matching FEATURE_SCHEMA
    minus doc_id).
    """
    n = len(payload)
    checksum = 0
    for b in payload[:4096]:
        checksum = (checksum * 131 + b) % (1 << 32)
    return {
        "n_bytes": n,
        "checksum": checksum,
        "head": payload[:8].hex(),
        # fake "decoded dimensions" derived from content
        "width": (checksum % 640) + 1,
        "height": ((checksum // 640) % 480) + 1,
    }


def extract_features(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Batches arrive as Arrow-backed pandas DataFrames; the stub decoder
    runs per item inside the batch (a real codec would too — decode is
    inherently per-item), but transfer and scheduling are batched.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return mm.mapInPandas(batches, schema=FEATURE_SCHEMA)
