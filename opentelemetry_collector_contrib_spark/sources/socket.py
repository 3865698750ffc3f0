"""Socket-receiver framing: byte stream -> message frames.

Reference: receiver/syslogreceiver (syslog.go:61-71) and tcplog — a TCP
stream carries either newline-delimited ("non-transparent") frames or
RFC6587 octet-counted frames ("123 <123 bytes>124 <...>"). The socket
transport itself has no batch meaning (a table IS the transport), but
the FRAMING does: captured streams land in a table as one blob per
connection, and the framing op explodes each blob into ordered message
rows that feed :class:`~..operators.parsers.SyslogParser`.

- ``split_newline_frames``: pure Catalyst (`posexplode(split(...))`).
- ``split_octet_frames``: RFC6587 octet counting needs sequential
  boundary discovery (each frame's end defines the next frame's start),
  which no Column combinator expresses — this is the documented
  mapInPandas case (SURVEY.md 7.3: custom op tier (b)), Arrow-batched,
  one Python iteration per FRAME (not per byte). A malformed length
  prefix stops the walk and emits the remainder as one unparsed frame
  with ``valid = false`` (the reference errors the connection there).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SCHEMA = "stream_id string, frame_idx int, body string, valid boolean"


def split_newline_frames(
    df: DataFrame, blob_col: str = "data", id_col: str = "stream_id"
) -> DataFrame:
    """Non-transparent framing: one row per newline-delimited message."""
    return df.select(
        F.col(id_col).alias("stream_id"),
        F.posexplode(
            F.split(F.regexp_replace(F.col(blob_col), "\r?\n$", ""), "\r?\n")
        ).alias("frame_idx", "body"),
        F.lit(True).alias("valid"),
    )


def split_octet_frames(
    df: DataFrame, blob_col: str = "data", id_col: str = "stream_id"
) -> DataFrame:
    """RFC6587 octet-counted framing: ``<len> <len bytes>`` repeated."""
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("string").alias("stream_id"),
        F.col(blob_col).cast("string").alias("__blob__"),
    )

    def walk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, bodies, valids = [], [], [], []
            for sid, blob in zip(pdf["stream_id"], pdf["__blob__"]):
                if blob is None:
                    continue
                i, seq = 0, 0
                while i < len(blob):
                    j = blob.find(" ", i)
                    head = blob[i:j] if j != -1 else ""
                    if not head.isdigit():
                        ids.append(sid); idxs.append(seq)
                        bodies.append(blob[i:]); valids.append(False)
                        break
                    n = int(head)
                    msg = blob[j + 1 : j + 1 + n]
                    ids.append(sid); idxs.append(seq)
                    bodies.append(msg); valids.append(len(msg) == n)
                    seq += 1
                    i = j + 1 + n
            yield pd.DataFrame(
                {"stream_id": ids, "frame_idx": idxs, "body": bodies, "valid": valids}
            )

    return src.mapInPandas(walk, FRAME_SCHEMA)
