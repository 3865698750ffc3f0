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


# --- transforms (resize / frame-sample) ------------------------------------
#
# The transform stage of a multimodal training pipeline: normalize image
# sizes, decimate audio, keep every k-th video frame. Same execution
# shape as extract_features — Arrow-batched mapInPandas, decode/encode
# per item inside the batch, one output row per item (or per kept frame
# for the GIF sampler). The codecs are the dependency-free real ones
# from .codecs; payloads outside their subset degrade to ok=false rows
# with the reason, never to a dropped row or a thrown task.

RESIZE_SCHEMA = (
    "doc_id bigint, ok boolean, format string, width int, height int, "
    "payload binary, err string"
)


def resize_images(
    mm: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h); PNG/BMP in, PNG out.

    Nearest-neighbor (source index = floor(i * src/dst)) is the
    deterministic, interpolation-free kernel — bit-stable across
    platforms, which is what a reproducible training pipeline wants
    from its normalization pass."""
    from .codecs import decode_bmp_pixels, decode_png_pixels, encode_png, sniff

    def one(doc_id: int, payload: bytes) -> dict:
        try:
            fmt = sniff(payload)
            if fmt == "png":
                img = decode_png_pixels(payload)
            elif fmt == "bmp":
                img = decode_bmp_pixels(payload)
            else:
                raise ValueError(f"not a resizable image ({fmt})")
            src_w, src_h, rows = img["width"], img["height"], img["rows"]
            if src_w == 0 or src_h == 0:
                raise ValueError("empty image")
            out_rows = [
                [rows[(y * src_h) // out_h][(x * src_w) // out_w] for x in range(out_w)]
                for y in range(out_h)
            ]
            return {
                "doc_id": doc_id,
                "ok": True,
                "format": fmt,
                "width": out_w,
                "height": out_h,
                "payload": encode_png(out_rows, channels=img["channels"]),
                "err": None,
            }
        except Exception as exc:
            return {
                "doc_id": doc_id,
                "ok": False,
                "format": None,
                "width": None,
                "height": None,
                "payload": None,
                "err": str(exc)[:200],
            }

    cols = [f.split()[0] for f in RESIZE_SCHEMA.split(", ")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                [one(i, p) for i, p in zip(pdf[id_col], pdf["payload"])]
            )
            yield out[cols]

    return mm.mapInPandas(batches, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id bigint, ok boolean, sample_rate int, n_frames int, "
    "payload binary, err string"
)


def sample_audio(mm: DataFrame, every_k: int, id_col: str = "doc_id") -> DataFrame:
    """Decimate PCM-16 WAV audio: keep every k-th frame (all channels
    of it), output a WAV at sample_rate // k. Plain decimation without
    an anti-alias filter — the deterministic subset-selection semantics
    (a training pipeline that wants filtering decodes once and applies
    its own kernel on the samples column)."""
    from .codecs import decode_wav_samples, encode_wav

    def one(doc_id: int, payload: bytes) -> dict:
        try:
            wav = decode_wav_samples(payload)
            ch, rate, samples = wav["channels"], wav["sample_rate"], wav["samples"]
            n_frames = len(samples) // ch
            kept: list[int] = []
            for f in range(0, n_frames, every_k):
                kept.extend(samples[f * ch : (f + 1) * ch])
            new_rate = max(1, rate // every_k)
            return {
                "doc_id": doc_id,
                "ok": True,
                "sample_rate": new_rate,
                "n_frames": len(kept) // ch,
                "payload": encode_wav(kept, sample_rate=new_rate, channels=ch),
                "err": None,
            }
        except Exception as exc:
            return {
                "doc_id": doc_id,
                "ok": False,
                "sample_rate": None,
                "n_frames": None,
                "payload": None,
                "err": str(exc)[:200],
            }

    cols = [f.split()[0] for f in AUDIO_SCHEMA.split(", ")]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                [one(i, p) for i, p in zip(pdf[id_col], pdf["payload"])]
            )[cols]

    return mm.mapInPandas(batches, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, n_frames_total int, n_bytes int, "
    "checksum bigint, frame binary"
)


def sample_gif_frames(
    mm: DataFrame, every_k: int = 1, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sample animated GIFs: one output row per KEPT frame
    (every k-th image descriptor), carrying the frame's raw byte slice
    — extracted at the block-structure level without LZW decode
    (codecs.gif_frame_slices), so sampling a 100-frame GIF costs a
    byte walk, not a pixel decode. Non-GIF payloads yield no rows
    (filter semantics, like the reference's on_error=drop parsers)."""
    from .codecs import gif_frame_slices

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    slices = gif_frame_slices(payload)
                except Exception:
                    continue
                for idx in range(0, len(slices), every_k):
                    fr = slices[idx]
                    recs.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "n_frames_total": len(slices),
                            "n_bytes": len(fr),
                            "checksum": _checksum(fr),
                            "frame": fr,
                        }
                    )
            cols = [f.split()[0] for f in FRAME_SCHEMA.split(", ")]
            yield pd.DataFrame(recs, columns=cols)

    return mm.mapInPandas(batches, schema=FRAME_SCHEMA)


COMPRESSION_SCHEMA = "doc_id bigint, n_bytes int, n_compressed int, ratio_q4 bigint"


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6
) -> DataFrame:
    """Per-document zlib compressibility -- the quality signal
    RefinedWeb-class pipelines use to catch machine-generated or
    pathologically repetitive text that token-level heuristics miss
    (natural prose compresses to ~0.3-0.5 of its size at level 6;
    boilerplate and repeated spans go far lower, random gibberish
    stays near 1.0). Returns ``(id, n_bytes, n_compressed, ratio_q4)``
    with ``ratio = compressed/uncompressed`` in 1e4 fixed point;
    zero-byte documents get a null ratio.

    Execution shape: Arrow-batched ``mapInPandas`` (the
    :func:`extract_features` posture) -- transfer and scheduling are
    batched, zlib runs per item inside the batch, one Python worker
    per partition, zero shuffles. zlib output length at a fixed level
    is deterministic for a given zlib build, so pytest pins exact
    values; there is no DuckDB compression primitive, hence this op is
    pytest-gated with a rows-only driver check (documented in
    SURVEY.md section 2's table).
    """
    import zlib

    def batches(it):
        for pdf in it:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            nb = raw.map(len)
            nc = raw.map(lambda b: len(zlib.compress(b, level)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": nb.astype("int32"),
                    "n_compressed": nc.astype("int32"),
                }
            )
            # floor(10000*c/b + 0.5) in exact integer math
            out["ratio_q4"] = [
                (20000 * int(c) + int(b)) // (2 * int(b)) if b > 0 else None
                for b, c in zip(out["n_bytes"], out["n_compressed"])
            ]
            yield out

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batches, schema=COMPRESSION_SCHEMA
    )
