"""Recombine: stitch consecutive entries into one
(reference: pkg/stanza/operator/transformer/recombine/transformer.go:97-191).

Semantics: per ``source_identifier``, order rows, mark group boundaries
with an ``is_first_entry`` or ``is_last_entry`` predicate, concatenate
``combine_field`` with ``combine_with``; ``max_batch_size`` caps rows per
group; ``max_log_size`` flushes a group once the combined field reaches
that many bytes (transformer.go:151-158); ``max_unmatched_batch_size``
caps the batch of rows arriving before the first boundary match;
``overwrite_with: oldest|newest`` picks which row supplies the
non-combined fields. ``max_sources`` is an in-memory state cap in the
reference and has no batch meaning (the shuffle IS the state store).

Spark plan: window running-sum over the boundary flag assigns group ids
(no Python, two shuffle-free passes after one partitionBy shuffle), then
one hash aggregation:

    Window.partitionBy(source).orderBy(order) -> sum(flag) as group_id
    groupBy(source, group_id) -> sort_array(collect_list(struct)) -> concat

``max_log_size`` keeps the reference's exact flush-on-overflow
sequencing: the sorted collected array is folded (``F.aggregate``) into
size-capped sub-batches — a row that would overflow the running byte
budget closes the current batch and opens the next — then exploded back
to one output row per batch. Still zero Python in the row path.

Skew (north rule): a hot source_identifier serializes its window on one
task. ``salt_chunk=N`` distributes it: rows are range-salted into
chunks of N adjacent ``order_by`` values, per-(source, chunk) partial
boundary counts are aggregated (tiny frame), prefix offsets broadcast
back, and the within-chunk running sum + offset reproduces the exact
global group ids — a distributed prefix-sum, so output is identical
with salting on or off while the window runs on (source, chunk) tasks.
Requires a numeric ``order_by`` and ``is_first_entry`` mode (an
``is_last_entry`` flag needs the previous row, which crosses chunk
boundaries). ``force_flush_timeout`` has no batch meaning (SURVEY.md
7.3); the streaming variant uses a session window gap instead.

Memory bound: the ``collect_list`` aggregation buffers ONE group (not
one source) per buffer — a group is closed by any boundary match,
``max_batch_size`` rows, or ``max_log_size`` bytes, so with any of
those configured the buffer is explicitly capped (the reference's
in-memory batch has the same caps, transformer.go:151-175). Only the
degenerate config — no boundary ever matching and no cap set — buffers
a whole source in one buffer; set ``max_batch_size`` (or
``max_unmatched_batch_size``) in pathological-input deployments, same
as the reference's defaults-on posture.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..envelope import try_element_at


@dataclass
class Recombine:
    source_identifier: str = "conv_id"
    order_by: str = "turn_idx"
    combine_field: str = "text"
    combine_with: str = "\n"
    is_first_entry: str | None = None  # SQL expr marking a group start
    is_last_entry: str | None = None   # SQL expr marking a group end
    max_batch_size: int | None = None
    max_log_size: int | None = None    # byte cap on the combined field
    max_unmatched_batch_size: int | None = None  # cap on the pre-match batch
    overwrite_with: str = "oldest"     # oldest|newest
    salt_chunk: int | None = None      # rows-per-chunk range salt for hot keys

    def __post_init__(self):
        if self.salt_chunk is not None:
            if self.salt_chunk < 1:
                raise ValueError("salt_chunk must be >= 1")
            if self.is_last_entry is not None:
                raise ValueError(
                    "salt_chunk requires is_first_entry mode: an "
                    "is_last_entry flag reads the previous row, which "
                    "crosses chunk boundaries"
                )

    # --- group assignment ---------------------------------------------------

    def _grouped(self, df: DataFrame) -> DataFrame:
        src, order = self.source_identifier, self.order_by
        w = Window.partitionBy(src).orderBy(order)
        if self.is_first_entry is not None:
            flag = F.expr(self.is_first_entry).cast("int")
            if self.salt_chunk:
                return self._grouped_salted(df, flag)
            group = F.sum(flag).over(w)
        elif self.is_last_entry is not None:
            # a row after a last-entry row starts a new group
            prev_last = F.lag(F.expr(self.is_last_entry).cast("int"), 1, 1).over(w)
            group = F.sum(prev_last).over(w)
        else:
            group = F.lit(0)
        return df.withColumn("__grp__", group)

    def _grouped_salted(self, df: DataFrame, flag: Column) -> DataFrame:
        """Distributed prefix-sum: exact global group ids without a
        single-task window over the hot source."""
        src, order = self.source_identifier, self.order_by
        chunk = F.floor(F.col(order) / F.lit(self.salt_chunk))
        with_chunk = df.withColumn("__chunk__", chunk).withColumn("__flag__", flag)
        # per-(source, chunk) boundary counts: tiny aggregate
        counts = with_chunk.groupBy(src, "__chunk__").agg(
            F.sum("__flag__").alias("__cnt__")
        )
        w_prev = (
            Window.partitionBy(src)
            .orderBy("__chunk__")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.withColumn(
            "__off__", F.coalesce(F.sum("__cnt__").over(w_prev), F.lit(0))
        ).select(src, "__chunk__", "__off__")
        w_chunk = Window.partitionBy(src, "__chunk__").orderBy(order)
        return (
            with_chunk.join(F.broadcast(offsets), [src, "__chunk__"])
            .withColumn("__grp__", F.sum("__flag__").over(w_chunk) + F.col("__off__"))
            .drop("__chunk__", "__flag__", "__off__")
        )

    # --- aggregation --------------------------------------------------------

    def __call__(self, df: DataFrame) -> DataFrame:
        src, order, fld = self.source_identifier, self.order_by, self.combine_field
        out = self._grouped(df)
        mb, mu = self.max_batch_size, self.max_unmatched_batch_size
        if mb or mu:
            # One retag pass over the ORIGINAL group ids. The reference
            # checks BOTH caps on every append (transformer.go:151-158,
            # :186-188), so where both apply the effective cap is their
            # min. is_first mode: only group 0 (rows before the first
            # boundary) is matchless, so max_unmatched applies there and
            # max_batch_size everywhere. is_last mode: EVERY group is
            # matchless until its closing row, so the min of both caps
            # chunks every group — the closing match row lands in the
            # current partial chunk, matching the reference's flush
            # sequence (transformer_test.go:543-668). A sequential
            # two-pass retag would be wrong twice over: the second
            # pass's `__grp__ == 0` sees "0:0" strings (casts to null,
            # cap silently off), and nested splitting yields 3,2,3,2
            # flushes where the reference emits 3,3,3.
            if mu and self.is_first_entry is not None:
                cap0 = min(c for c in (mb, mu) if c)
                cap_col = (
                    F.when(F.col("__grp__") == 0, F.lit(cap0)).otherwise(F.lit(mb))
                    if mb
                    else F.when(F.col("__grp__") == 0, F.lit(cap0))
                )
            else:
                cap_col = F.lit(min(c for c in (mb, mu) if c))
            seq = F.row_number().over(
                Window.partitionBy(src, "__grp__").orderBy(order)
            )
            sub = F.floor((seq - 1) / cap_col).cast("string")
            tag = F.concat_ws(":", F.col("__grp__").cast("string"), sub)
            out = out.withColumn(
                "__grp__",
                F.when(cap_col.isNotNull(), tag).otherwise(
                    F.col("__grp__").cast("string")
                ),
            )
        if self.max_log_size:
            return self._combine_size_capped(df, out)
        other = [c for c in df.columns if c not in (src, fld)]
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

    def _combine_size_capped(self, df: DataFrame, grouped: DataFrame) -> DataFrame:
        """Fold each boundary group's sorted rows into byte-capped
        sub-batches (exact flush-on-overflow order), then emit one row
        per batch."""
        src, order, fld = self.source_identifier, self.order_by, self.combine_field
        carried = [c for c in df.columns if c != src]
        row_struct = F.struct(
            F.col(order).alias("__o__"),
            *[F.col(c).alias(c) for c in carried if c != order],
        )
        collected = F.sort_array(F.collect_list(row_struct))
        per_group = grouped.groupBy(src, "__grp__").agg(collected.alias("__rows__"))
        elem_ddl = per_group.select(
            try_element_at("__rows__", 1).alias("e")
        ).schema[0].dataType.simpleString()
        empty_batches = F.expr(f"cast(array() as array<array<{elem_ddl}>>)")
        empty_cur = F.expr(f"cast(array() as array<{elem_ddl}>)")
        limit = F.lit(self.max_log_size)
        sep_len = len(self.combine_with.encode())

        def fold(acc: Column, x: Column) -> Column:
            # transformer.go:173-189: append (separator counted), THEN
            # flush when the combined length EXCEEDS max_log_size — the
            # overflowing entry stays in the batch it overflowed
            new_size = (
                acc.getField("size")
                + F.when(F.size(acc.getField("cur")) > 0, sep_len).otherwise(0)
                + F.octet_length(x.getField(fld))
            )
            cur2 = F.concat(acc.getField("cur"), F.array(x))
            overflow = new_size > limit
            return F.struct(
                F.when(overflow, F.concat(acc.getField("batches"), F.array(cur2)))
                .otherwise(acc.getField("batches"))
                .alias("batches"),
                F.when(overflow, empty_cur).otherwise(cur2).alias("cur"),
                F.when(overflow, F.lit(0).cast("bigint"))
                .otherwise(new_size)
                .alias("size"),
            )

        batches = F.aggregate(
            F.col("__rows__"),
            F.struct(
                empty_batches.alias("batches"),
                empty_cur.alias("cur"),
                F.lit(0).cast("bigint").alias("size"),
            ),
            fold,
            lambda acc: F.when(
                F.size(acc.getField("cur")) > 0,
                F.concat(acc.getField("batches"), F.array(acc.getField("cur"))),
            ).otherwise(acc.getField("batches")),
        )
        exploded = per_group.select(
            F.col(src), F.explode(batches).alias("__batch__")
        )
        pick_idx = 1 if self.overwrite_with == "oldest" else -1
        picked = try_element_at("__batch__", pick_idx)
        cols = [F.col(src)] + [
            (
                F.array_join(
                    F.transform("__batch__", lambda s: s.getField(fld)),
                    self.combine_with,
                ).alias(fld)
                if c == fld
                else picked.getField("__o__").alias(order)
                if c == order
                else picked.getField(c).alias(c)
            )
            for c in carried
        ]
        return exploded.select(*cols)
