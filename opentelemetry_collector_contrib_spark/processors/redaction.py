"""Redaction processor: allow/deny attribute keys, mask values by regex.

Reference: processor/redactionprocessor/processor.go:83-164 —
- keys not on the allowlist are DELETED (unless ``allow_all_keys``);
- values matching blocked patterns get the MATCHED SUBSTRING replaced
  with ``****`` (``ReplaceAllString``, :125 — not the whole value), one
  pattern after another;
- ``ignored_keys`` are exempt from both deletion and masking (:99-104);
- the summary level controls meta attributes written INTO the map
  (:144-164): ``debug`` = sorted key lists + counts, ``info`` = counts
  only, anything else = nothing. Keys: ``redaction.redacted.keys`` /
  ``.count`` (deleted), ``redaction.masked.keys``/``.count`` (value
  masked), ``redaction.ignored.count``.
- on REAPPLICATION the summary merges: previous keys are split out,
  appended, re-sorted; counts add (:151-161). The meta keys themselves
  are implicitly allowlisted (makeAllowList :186-199) so a second pass
  never deletes them.

Everything is one fused map projection — no shuffle, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

REDACTED_KEYS = "redaction.redacted.keys"
REDACTED_COUNT = "redaction.redacted.count"
MASKED_KEYS = "redaction.masked.keys"
MASKED_COUNT = "redaction.masked.count"
IGNORED_COUNT = "redaction.ignored.count"
_META_KEYS = [
    REDACTED_KEYS, REDACTED_COUNT, MASKED_KEYS, MASKED_COUNT, IGNORED_COUNT,
]


@dataclass
class Redaction:
    allowed_keys: list[str] | None = None       # None = allow all keys
    blocked_value_patterns: list[str] = field(default_factory=list)
    ignored_keys: list[str] = field(default_factory=list)
    allow_all_keys: bool = False
    summary: str | bool = "default"             # debug|info|silent|default
    attributes_col: str = "attributes"

    def __post_init__(self):
        if self.summary is True:     # legacy boolean forms
            self.summary = "debug"
        elif self.summary is False:
            self.summary = "silent"

    def _ignored(self, k: Column) -> Column:
        if not self.ignored_keys:
            return F.lit(False)
        return k.isin(self.ignored_keys)

    def __call__(self, df: DataFrame) -> DataFrame:
        attrs = F.coalesce(
            F.col(self.attributes_col),
            F.from_json(F.lit("{}"), "map<string,string>"),
        )
        allow_all = self.allow_all_keys or self.allowed_keys is None
        allowset = sorted(set(self.allowed_keys or []) | set(_META_KEYS))

        def deleted(k: Column) -> Column:
            if allow_all:
                return F.lit(False)
            return ~self._ignored(k) & ~k.isin(allowset)

        to_delete = F.sort_array(
            F.map_keys(F.map_filter(attrs, lambda k, _: deleted(k)))
        )
        kept = F.map_filter(attrs, lambda k, _: ~deleted(k))

        if self.blocked_value_patterns:
            any_pattern = "|".join(
                f"(?:{p})" for p in self.blocked_value_patterns
            )

            def masked_val(v: Column) -> Column:
                for p in self.blocked_value_patterns:
                    v = F.regexp_replace(v, p, "****")
                return v

            def hit(k: Column, v: Column) -> Column:
                return ~self._ignored(k) & v.rlike(any_pattern)

            to_block = F.sort_array(F.map_keys(F.map_filter(kept, hit)))
            new_attrs = F.transform_values(
                kept,
                lambda k, v: F.when(hit(k, v), masked_val(v)).otherwise(v),
            )
        else:
            to_block = F.array().cast("array<string>")
            new_attrs = kept

        ignoring = F.sort_array(
            F.map_keys(F.map_filter(attrs, lambda k, _: self._ignored(k)))
        )

        # --- summary meta attributes (addMetaAttrs) ---------------------
        def upsert(m: Column, key: str, value: Column, cond: Column) -> Column:
            cleaned = F.map_filter(m, lambda k, _: k != F.lit(key))
            return F.when(
                cond, F.map_concat(cleaned, F.create_map(F.lit(key), value))
            ).otherwise(m)

        def add_meta(m: Column, keys_arr: Column, values_attr: str | None,
                     count_attr: str) -> Column:
            cnt = F.size(keys_arr)
            nonzero = cnt > 0
            if self.summary == "debug" and values_attr is not None:
                prev = try_element_at(attrs, values_attr)
                merged = F.array_join(
                    F.array_sort(
                        F.concat(
                            keys_arr,
                            F.coalesce(
                                F.split(prev, ","),
                                F.array().cast("array<string>"),
                            ),
                        )
                    ),
                    ",",
                )
                m = upsert(m, values_attr, merged, nonzero)
            if self.summary in ("debug", "info"):
                prev_cnt = F.coalesce(
                    try_element_at(attrs, count_attr).cast("long"), F.lit(0)
                )
                m = upsert(
                    m, count_attr, (cnt + prev_cnt).cast("string"), nonzero
                )
            return m

        if self.summary in ("debug", "info"):
            new_attrs = add_meta(new_attrs, to_delete, REDACTED_KEYS, REDACTED_COUNT)
            new_attrs = add_meta(new_attrs, to_block, MASKED_KEYS, MASKED_COUNT)
            new_attrs = add_meta(new_attrs, ignoring, None, IGNORED_COUNT)

        return df.withColumn(self.attributes_col, new_attrs)
