"""Recombine: stitch consecutive entries into one
(reference: pkg/stanza/operator/transformer/recombine/transformer.go:97-191).

Semantics: per ``source_identifier``, order rows, mark group boundaries
with an ``is_first_entry`` or ``is_last_entry`` predicate, concatenate
``combine_field`` with ``combine_with``; ``max_batch_size`` caps rows per
group; ``overwrite_with: oldest|newest`` picks which row supplies the
non-combined fields.

Spark plan: window running-sum over the boundary flag assigns group ids
(no Python, two shuffle-free passes after one partitionBy shuffle), then
one hash aggregation:

    Window.partitionBy(source).orderBy(order) -> sum(flag) as group_id
    groupBy(source, group_id) -> sort_array(collect_list(struct)) -> concat

Skew note (north rule): a hot source_identifier serializes its window on
one task — callers with known-hot sources should pre-split via
``max_batch_size`` or salt the source; AQE skew-shuffle handles the agg.
``force_flush_timeout`` has no batch meaning (SURVEY.md 7.3); the
streaming variant uses a session window gap instead.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class Recombine:
    source_identifier: str = "conv_id"
    order_by: str = "turn_idx"
    combine_field: str = "text"
    combine_with: str = "\n"
    is_first_entry: str | None = None  # SQL expr marking a group start
    is_last_entry: str | None = None   # SQL expr marking a group end
    max_batch_size: int | None = None
    overwrite_with: str = "oldest"     # oldest|newest

    def __call__(self, df: DataFrame) -> DataFrame:
        src, order, fld = self.source_identifier, self.order_by, self.combine_field
        w = Window.partitionBy(src).orderBy(order)
        if self.is_first_entry is not None:
            flag = F.expr(self.is_first_entry).cast("int")
            group = F.sum(flag).over(w)
        elif self.is_last_entry is not None:
            # a row after a last-entry row starts a new group
            prev_last = F.lag(F.expr(self.is_last_entry).cast("int"), 1, 1).over(w)
            group = F.sum(prev_last).over(w)
        else:
            group = F.lit(0)
        out = df.withColumn("__grp__", group)
        if self.max_batch_size:
            seq = F.row_number().over(
                Window.partitionBy(src, "__grp__").orderBy(order)
            )
            out = out.withColumn(
                "__grp__",
                F.concat_ws(
                    ":",
                    F.col("__grp__").cast("string"),
                    F.floor((seq - 1) / self.max_batch_size).cast("string"),
                ),
            )
        other = [
            c for c in df.columns if c not in (src, fld)
        ]
        pick = F.min if self.overwrite_with == "oldest" else F.max
        collected = F.sort_array(
            F.collect_list(F.struct(F.col(order).alias("__o__"), F.col(fld).alias("__v__")))
        )
        agg = [
            F.array_join(
                F.transform(collected, lambda s: s.getField("__v__")),
                self.combine_with,
            ).alias(fld)
        ] + [
            (
                pick(F.col(order)).alias(c)
                if c == order
                else pick(F.struct(F.col(order).alias("__o__"), F.col(c).alias("__c__")))
                .getField("__c__")
                .alias(c)
            )
            for c in other
        ]
        return (
            out.groupBy(src, "__grp__")
            .agg(*agg)
            .drop("__grp__")
            .select(src, *[c for c in df.columns if c != src])
        )
