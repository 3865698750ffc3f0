"""UDP input: datagram table -> entry rows.

Reference: ``pkg/stanza/operator/input/udp/input.go`` (readAndProcess /
processMessage / handleMessage) and ``config.go`` (BaseConfig). The
reference's async reader/processor pool (input.go:130-175) is a
throughput mechanism for one listening socket; in a distributed engine
the datagram CAPTURE is external (each ingest host appends its packets
to a table/stream partition) and the pool's role is played by Spark
task parallelism, so this operator models everything AFTER the socket
read:

- one datagram = one packet row (``data`` binary/string, plus optional
  ``remote_ip``/``remote_port``/``local_ip``/``local_port``/``*_host``
  columns captured at the edge);
- per-packet trailing trim: drop trailing bytes < 0x20
  (removeTrailingCharactersAndNULsFromBuffer, input.go:237-243) —
  ``message1\\n`` / ``message1\\r\\n`` -> ``message1``;
- ``MaxUDPSize`` (64 KiB) truncation (truncateMaxLog, input.go:178-188);
- ``one_log_per_packet=True``: the whole packet is one entry;
- otherwise the packet runs through the split func. The reference's
  DEFAULT split is the never-matching ``.^`` pattern + flush-at-EOF
  (config.go:46-49), i.e. the whole packet is STILL one entry — embedded
  newlines survive (udp input_test.go "NewlineInMessage":
  ``message1\\nmessage2\\n`` -> one entry ``message1\\nmessage2``). Pass
  ``line_end_pattern`` (e.g. ``\\r?\\n``) to actually split;
- charset decode (decode.go semantics) JVM-side via ``F.decode``;
- ``add_attributes=True``: ``net.transport = IP.UDP`` plus host/peer
  ip/port/name (input.go:190-210). The reference resolves names by
  cached reverse DNS (helper.IPResolver); a row-path DNS call does not
  belong in a 1000-executor scan, so names come from the optional
  ``remote_host``/``local_host`` columns when present (the edge capture
  or a broadcast enrich join supplies them) and fall back to the ip.

Everything is Column expressions — zero shuffle, no Python in the row
path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_UDP_SIZE = 64 * 1024


@dataclass
class UdpInput:
    data_col: str = "data"
    one_log_per_packet: bool = False
    add_attributes: bool = False
    encoding: str = "utf-8"
    # None = the reference's default never-matching split: whole packet
    # is one entry. A pattern splits the packet AFTER each match.
    line_end_pattern: str | None = None

    def _decode(self, col: Column) -> Column:
        # accept either binary packets or already-string captures
        return F.when(
            F.lit(self.encoding.lower() in ("utf-8", "utf8")),
            col.cast("string"),
        ).otherwise(F.decode(col.cast("binary"), self.encoding))

    def __call__(self, df: DataFrame) -> DataFrame:
        data = F.col(self.data_col)
        # truncateMaxLog: a UDP payload can't exceed 64 KiB, but a
        # corrupt capture row could — clamp BEFORE decode like the
        # reference clamps the read buffer
        clamped = F.substring(data.cast("binary"), 1, MAX_UDP_SIZE)
        body = self._decode(clamped)
        # removeTrailingCharactersAndNULsFromBuffer: strip trailing
        # bytes < 0x20 (newlines, CRs, NULs) from the packet END only
        body = F.regexp_replace(body, "[\\x00-\\x1f]+$", "")

        out_cols = [c for c in df.columns if c != self.data_col]
        if self.one_log_per_packet or self.line_end_pattern is None:
            # default split config is the never-matching '.^' + flush at
            # EOF: one entry per packet either way, newlines preserved
            entries = df.select(
                *out_cols, F.lit(0).alias("frame_idx"), body.alias("body")
            )
        else:
            entries = df.select(
                *out_cols,
                F.posexplode(
                    F.filter(
                        F.split(body, self.line_end_pattern), lambda t: t != ""
                    )
                ).alias("frame_idx", "body"),
            )
        if self.add_attributes:
            entries = entries.withColumn("attributes", self._attrs(entries))
        return entries

    def _attrs(self, df: DataFrame) -> Column:
        def opt(col: str) -> Column:
            return (
                F.col(col).cast("string")
                if col in df.columns
                else F.lit(None).cast("string")
            )

        host_ip, peer_ip = opt("local_ip"), opt("remote_ip")
        pairs = [
            (F.lit("net.transport"), F.lit("IP.UDP")),
            (F.lit("net.host.ip"), host_ip),
            (F.lit("net.host.port"), opt("local_port")),
            (F.lit("net.host.name"), F.coalesce(opt("local_host"), host_ip)),
            (F.lit("net.peer.ip"), peer_ip),
            (F.lit("net.peer.port"), opt("remote_port")),
            (F.lit("net.peer.name"), F.coalesce(opt("remote_host"), peer_ip)),
        ]
        entries = F.array(
            *[
                F.struct(k.alias("key"), v.alias("value"))
                for k, v in pairs
            ]
        )
        # excludes unset values, like entry.AddAttribute only firing
        # when the addr is present
        return F.map_from_entries(
            F.filter(entries, lambda e: e.getField("value").isNotNull())
        )
