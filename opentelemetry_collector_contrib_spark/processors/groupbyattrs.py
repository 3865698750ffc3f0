"""groupbyattrs processor: promote record attrs to resource identity.

Reference: processor/groupbyattrsprocessor/processor.go:63-101 — for
each record, extract the configured attribute keys that are PRESENT in
its attributes (extractGroupingAttributes), delete those from the
record level (deleteAttributes), and regroup the record under the
identity (base resource attrs overridden by extracted attrs),
deduplicating resources via a 128-bit MapHash
(pkg/pdatautil/hash.go:52). Records carrying none of the keys stay
under their base resource identity unchanged.

Columnar restatement: resource identity is just columns, so "grouping"
is a partitioning concern, not a physical regroup. This operator

- promotes each configured key to a top-level column (null when the
  record doesn't carry it),
- moves found keys out of the record-level ``attributes`` map
  (``move=True``, the reference behavior; set ``False`` to keep the
  legacy promote-only posture),
- folds extracted attrs over the optional ``resource`` map column
  (extracted values win, like Map.PutEmpty on the copied resource),
- stamps an order-independent 64-bit identity hash over the combined
  resource identity for lineage parity with MapHash,
- optionally repartitions on the promoted keys when a downstream op
  needs co-location (by default Catalyst decides — at 100 TB an
  unconditional shuffle here would be pure waste).

Everything is Column expressions (map_filter/map_concat/xxhash64):
zero shuffles unless ``repartition=True``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at


@dataclass
class GroupByAttrs:
    keys: list[str] = field(default_factory=list)  # attribute keys to promote
    attrs_col: str = "attributes"
    resource_col: str | None = None  # auto-detect "resource" when present
    move: bool = True
    repartition: bool = False
    hash_col: str | None = "resource_hash"

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df
        has_map = self.attrs_col in df.columns
        res_col = self.resource_col
        if res_col is None and "resource" in df.columns:
            res_col = "resource"
        key_arr = F.array(*[F.lit(k) for k in self.keys]) if self.keys else None

        promoted = []
        for k in self.keys:
            if k in out.columns:
                promoted.append(k)
                continue
            if has_map:
                out = out.withColumn(k, try_element_at(F.col(self.attrs_col), k))
                promoted.append(k)

        extracted = None
        if has_map and self.keys:
            # only keys actually present in this record's map — the
            # reference's extractGroupingAttributes found-set. Stash it
            # in a real column BEFORE the move below: a bare Column
            # expression would re-resolve against the rewritten (already
            # emptied) attributes map when used afterwards.
            out = out.withColumn(
                "__gba_extracted__",
                F.map_filter(
                    F.col(self.attrs_col),
                    lambda k, _v: F.array_contains(key_arr, k),
                ),
            )
            extracted = F.col("__gba_extracted__")
            if self.move:
                out = out.withColumn(
                    self.attrs_col,
                    F.map_filter(
                        F.col(self.attrs_col),
                        lambda k, _v: ~F.array_contains(key_arr, k),
                    ),
                )

        if self.hash_col:
            # combined identity: base resource attrs with extracted keys
            # overridden (reference copies the resource then PutEmpty's
            # the extracted values on top)
            if res_col is not None:
                base = F.col(res_col)
                if key_arr is not None:
                    base = F.map_filter(
                        base, lambda k, _v: ~F.array_contains(key_arr, k)
                    )
                identity = (
                    F.map_concat(base, extracted) if extracted is not None else base
                )
            elif extracted is not None:
                identity = extracted
            elif promoted:
                identity = F.map_from_arrays(
                    F.array(*[F.lit(c) for c in promoted]),
                    F.array(*[F.col(c).cast("string") for c in promoted]),
                )
            else:
                # no resource column, no keys: every record shares the
                # empty identity — one resource, like the reference's
                # compaction case
                identity = F.expr("map()").cast("map<string,string>")
            if identity is not None:
                # hash over SORTED entries: map iteration order is not
                # identity, mirroring pdatautil's order-insensitive MapHash
                out = out.withColumn(
                    self.hash_col, F.xxhash64(F.array_sort(F.map_entries(identity)))
                )
        out = out.drop("__gba_extracted__")
        if self.repartition and promoted:
            out = out.repartition(*[F.col(c) for c in promoted])
        return out
