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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
