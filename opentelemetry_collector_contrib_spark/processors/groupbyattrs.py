"""groupbyattrs processor: promote record attrs to resource identity.

Reference: processor/groupbyattrsprocessor/processor.go:63-101 — move
listed record attributes to the resource level and regroup records under
the (resource + extracted attrs) identity, deduplicating resources via a
128-bit MapHash (pkg/pdatautil/hash.go:52).

Columnar restatement: resource identity is just columns, so "grouping"
is a partitioning concern, not a data change. This operator (a) promotes
the listed attribute keys to top-level columns, (b) optionally
repartitions by them (only when a downstream op needs co-location — by
default Catalyst decides), (c) stamps a 64-bit identity hash column for
lineage parity with MapHash.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class GroupByAttrs:
    keys: list[str] = field(default_factory=list)  # attribute keys to promote
    repartition: bool = False
    hash_col: str | None = "resource_hash"

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df
        promoted = []
        for k in self.keys:
            if k in out.columns:
                promoted.append(k)
                continue
            out = out.withColumn(k, F.element_at(F.col("attributes"), k))
            promoted.append(k)
        if self.hash_col:
            basis = promoted or (["resource"] if "resource" in out.columns else [])
            if basis:
                out = out.withColumn(self.hash_col, F.xxhash64(*[F.col(c) for c in basis]))
        if self.repartition and promoted:
            out = out.repartition(*[F.col(c) for c in promoted])
        return out
