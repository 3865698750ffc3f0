"""Redaction processor: allow/deny attribute keys, mask values by regex.

Reference: processor/redactionprocessor/processor.go:83-175 — keys not on
the allowlist are deleted; values matching blocked patterns are masked;
``redaction.masked.keys``/``.count`` meta-attributes record what happened.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Redaction:
    allowed_keys: list[str] | None = None       # None = allow all keys
    blocked_value_patterns: list[str] = field(default_factory=list)
    attributes_col: str = "attributes"
    summary: bool = True  # emit redaction meta attrs

    def __call__(self, df: DataFrame) -> DataFrame:
        attrs = F.col(self.attributes_col)
        before_keys = F.map_keys(attrs)
        if self.allowed_keys is not None:
            allowed = [F.lit(k) for k in self.allowed_keys]
            attrs_allowed = F.map_filter(
                attrs, lambda k, _: k.isin(self.allowed_keys)
            )
        else:
            attrs_allowed = attrs
        masked = attrs_allowed
        blocked = F.lit(False)
        if self.blocked_value_patterns:
            pattern = "|".join(f"(?:{p})" for p in self.blocked_value_patterns)
            masked = F.transform_values(
                attrs_allowed,
                lambda _, v: F.when(v.rlike(pattern), F.lit("****")).otherwise(v),
            )
        # single withColumns: every expression resolves against the
        # INPUT frame (a chained withColumn would resolve the summary's
        # attribute references against the already-masked column)
        new = {self.attributes_col: masked}
        if self.summary:
            masked_keys = F.map_keys(
                F.map_filter(masked, lambda _, v: v == F.lit("****"))
            ) if self.blocked_value_patterns else F.array().cast("array<string>")
            new["redaction_ignored_keys"] = F.array_except(
                before_keys, F.map_keys(masked)
            )
            new["redaction_masked_keys"] = masked_keys
            new["redaction_masked_count"] = F.size(masked_keys)
        return df.withColumns(new)
