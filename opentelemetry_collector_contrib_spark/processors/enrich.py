"""Lookup enrichment: broadcast join against a small dimension table.

This is the Spark restatement of the reference's k8sattributes processor
(processor/k8sattributesprocessor/processor.go:110-175 — pod IP ->
metadata map lookup) and geoip processor
(processor/geoipprocessor/geoip_processor.go:83-135): a slowly-changing
dimension looked up per record.

Scale posture: the dimension is explicitly ``F.broadcast`` so the join
is a BroadcastHashJoin — no shuffle of the fact side regardless of fact
size (the 100 TB side never moves). If the dimension exceeds the
broadcast threshold on a real cluster, pre-bucket both sides instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at


@dataclass
class LookupEnrich:
    dim: DataFrame
    keys: list[str] = field(default_factory=list)  # equi-join key columns
    how: str = "left"  # records with no match keep null attrs (k8s semantics)
    prefix: str = ""   # prefix applied to added dimension columns

    def __call__(self, df: DataFrame) -> DataFrame:
        dim = self.dim
        added = [c for c in dim.columns if c not in self.keys]
        if self.prefix:
            for c in added:
                dim = dim.withColumnRenamed(c, f"{self.prefix}{c}")
            added = [f"{self.prefix}{c}" for c in added]
        out = df.join(F.broadcast(dim), on=self.keys, how=self.how)
        # preserve caller column order + appended dim columns
        return out.select(*df.columns, *added)


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string -> BIGINT (null for anything malformed)."""
    parts = F.split(col, r"\.")
    octets = [try_element_at(parts, i + 1).cast("bigint") for i in range(4)]
    valid = col.rlike(r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    for o in octets:
        valid = valid & (o <= 255)
    packed = octets[0] * 16777216 + octets[1] * 65536 + octets[2] * 256 + octets[3]
    return F.when(valid, packed)


@dataclass
class CidrEnrich:
    """Prefix/CIDR-range lookup enrichment — the geoip posture.

    The reference geoip processor resolves a record's IP against
    provider prefix ranges (processor/geoipprocessor/geoip_processor.go:
    83-135, MaxMind-style disjoint CIDR databases); k8sattributes pod-IP
    association has the same range-lookup shape. A plain equi-join can't
    express "ip falls inside prefix", and a naive theta-join is a
    cartesian product.

    Spark plan: the CIDR dimension expands each prefix into the /16
    bucket(s) it covers (one row per bucket — a /8 becomes 256 rows,
    a /24 one row; dims stay broadcast-small), the fact side computes
    ``ip_int >> 16`` as its bucket, and a broadcast EQUI-join on the
    bucket + a residual ``start <= ip <= end`` range filter resolves the
    prefix. The 100 TB fact side never shuffles; there is no
    BroadcastNestedLoopJoin anywhere in the plan.

    ``longest_prefix_match=True`` handles overlapping prefixes (LPM, the
    general routing-table semantic) at the cost of ONE exchange for the
    per-record rank window; the default assumes the provider ranges are
    disjoint (true for MaxMind exports), keeping the zero-shuffle plan.
    """

    dim: DataFrame                      # cidr_col + attribute columns
    ip_col: str = "ip"
    cidr_col: str = "cidr"
    prefix: str = "geo_"
    how: str = "left"
    longest_prefix_match: bool = False

    def _ranges(self) -> tuple[DataFrame, list[str]]:
        dim = self.dim
        added = [c for c in dim.columns if c != self.cidr_col]
        if self.prefix:
            for c in added:
                dim = dim.withColumnRenamed(c, f"{self.prefix}{c}")
            added = [f"{self.prefix}{c}" for c in added]
        base = ipv4_to_long(F.split(F.col(self.cidr_col), "/").getItem(0))
        plen = F.split(F.col(self.cidr_col), "/").getItem(1).cast("int")
        span = F.pow(F.lit(2.0), 32 - plen).cast("bigint")
        start = (base / span).cast("bigint") * span  # zero the host bits
        ranges = dim.select(
            start.alias("__net_start"),
            (start + span - 1).alias("__net_end"),
            plen.alias("__plen"),
            *added,
        )
        # one dim row per /16 bucket the range covers
        buckets = ranges.select(
            F.explode(
                F.sequence(
                    (F.col("__net_start") / 65536).cast("bigint"),
                    (F.col("__net_end") / 65536).cast("bigint"),
                )
            ).alias("__bucket"),
            "__net_start",
            "__net_end",
            "__plen",
            *added,
        )
        return buckets, added

    def __call__(self, df: DataFrame) -> DataFrame:
        buckets, added = self._ranges()
        ip_int = ipv4_to_long(F.col(self.ip_col))
        fact = df.withColumn("__ip_int", ip_int).withColumn(
            "__bucket", (F.col("__ip_int") / 65536).cast("bigint")
        )
        if self.longest_prefix_match:
            # unique record id so duplicate fact rows don't collapse
            # into one rank partition
            fact = fact.withColumn("__rid", F.monotonically_increasing_id())
        in_range = F.col("__ip_int").between(
            F.col("__net_start"), F.col("__net_end")
        )
        if self.how == "left":
            # left join keeps unmatched records with null attrs (geoip
            # skips records whose IP resolves nowhere) — the range
            # residual rides IN the join condition so non-matching
            # bucket collisions don't null out real rows
            out = fact.join(
                F.broadcast(buckets),
                (fact["__bucket"] == buckets["__bucket"]) & in_range,
                "left",
            )
        else:
            out = fact.join(F.broadcast(buckets), ["__bucket"]).filter(in_range)
        if self.longest_prefix_match:
            w = Window.partitionBy("__rid").orderBy(F.col("__plen").desc_nulls_last())
            out = out.withColumn("__rn", F.row_number().over(w)).filter(
                F.col("__rn") == 1
            )
        return out.select(*[fact[c] for c in df.columns], *added)


def probe_ip_attr(attrs_col: Column, keys: list[str]) -> Column:
    """The geoip processor's IP resolution over a resource-attribute map
    (geoip_processor.go:40-65 parseIP/ipFromResourceAttributes): probe
    the configured keys IN ORDER and take the first value that parses as
    a valid, SPECIFIED IPv4 — malformed values and the unspecified
    address (0.0.0.0) are skipped, continuing to the next key; null when
    nothing resolves (the processor then leaves the record untouched)."""
    cands = []
    for k in keys:
        v = try_element_at(attrs_col, k)
        n = ipv4_to_long(v)
        cands.append(F.when(n.isNotNull() & (n != 0), v))
    return F.coalesce(*cands) if cands else F.lit(None).cast("string")


@dataclass
class GeoIpEnrich:
    """processor/geoipprocessor twin: resolve the record's IP from an
    ordered list of resource-attribute keys (default
    ``['source.address']``, factory.go:23-25), then look it up against
    the provider's CIDR ranges via :class:`CidrEnrich` — records with no
    resolvable IP or no covering range pass through with null geo
    attributes (processResource returns nil on errIPNotFound). Broadcast
    range join: the fact side never shuffles."""

    dim: DataFrame
    attributes: list[str] = field(default_factory=lambda: ["source.address"])
    attrs_col: str = "attributes"
    cidr_col: str = "cidr"
    prefix: str = "geo_"

    def __call__(self, df: DataFrame) -> DataFrame:
        probed = df.withColumn(
            "__geoip", probe_ip_attr(F.col(self.attrs_col), self.attributes)
        )
        enr = CidrEnrich(
            dim=self.dim, ip_col="__geoip", cidr_col=self.cidr_col,
            prefix=self.prefix, how="left",
        )
        return enr(probed).drop("__geoip")
