"""Attributes/resource processor: ordered action list over metadata.

Reference semantics: internal/coreinternal/attraction/attraction.go —
actions ``insert`` (only if absent, :106-140), ``update`` (only if
present), ``upsert``, ``delete``, ``hash`` (SHA1, :235), ``extract``
(regex named groups -> new attrs, :235-260), ``convert`` (:261-276),
with value sources literal or ``from_attribute``. Include/exclude match
sets guard which records the actions touch
(internal/filter/filterconfig/config.go:68-110).

Columnar restatement: attributes are either real columns (fast path) or
entries in the ``attributes`` map; each action compiles to one
``withColumn``/map-upsert projection guarded by ``F.when``.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import field_delete, field_get, field_set


@dataclass
class Action:
    action: str                      # insert|update|upsert|delete|hash|extract|convert
    key: str = ""                    # target field path
    value: object = None             # literal value
    from_attribute: str | None = None
    pattern: str | None = None       # for extract
    converted_type: str | None = None  # int|double|string
    expr: str | None = None          # Spark-native extension: SQL expr value


@dataclass
class AttributesProcessor:
    actions: list[Action]
    include: str | None = None  # SQL predicate: record must match to be touched
    exclude: str | None = None  # SQL predicate: matching records are skipped

    def _guard(self) -> Column | None:
        conds = []
        if self.include is not None:
            conds.append(F.expr(self.include))
        if self.exclude is not None:
            conds.append(~F.coalesce(F.expr(self.exclude), F.lit(False)))
        if not conds:
            return None
        g = conds[0]
        for c in conds[1:]:
            g = g & c
        return g

    def __call__(self, df: DataFrame) -> DataFrame:
        guard = self._guard()

        def gated(new: Column, old: Column) -> Column:
            if guard is None:
                return new
            return F.when(guard, new).otherwise(old)

        for a in self.actions:
            if a.action in ("insert", "update", "upsert"):
                if a.expr is not None:
                    val = F.expr(a.expr)
                elif a.from_attribute is not None:
                    val = field_get(a.from_attribute)
                else:
                    val = F.lit(a.value)
                try:
                    current = field_get(a.key)
                    # probe whether the path resolves on this frame
                    df.select(current)
                    exists = True
                except Exception:
                    current = F.lit(None)
                    exists = False
                if a.action == "insert":
                    new = F.when(current.isNull(), val).otherwise(current) if exists else val
                elif a.action == "update":
                    if not exists:
                        continue
                    new = F.when(current.isNotNull(), val).otherwise(current)
                else:
                    new = val
                df = field_set(df, a.key, gated(new, current if exists else F.lit(None)))
            elif a.action == "delete":
                if guard is None:
                    df = field_delete(df, a.key)
                else:
                    df = field_set(df, a.key, gated(F.lit(None), field_get(a.key)))
            elif a.action == "hash":
                cur = field_get(a.key)
                df = field_set(df, a.key, gated(F.sha1(cur.cast("string")), cur))
            elif a.action == "extract":
                if not a.pattern:
                    raise ValueError("extract requires pattern")
                groups = _re.compile(
                    a.pattern.replace("(?<", "(?P<")
                ).groupindex
                jvm = _re.sub(r"\(\?P<", "(?<", a.pattern)
                jvm = _re.sub(r"\(\?<(?![=!])[^>]*>", "(", jvm)
                src = field_get(a.key)
                for name, idx in groups.items():
                    ok = src.rlike(jvm)
                    val = F.when(ok, F.regexp_extract(src, jvm, idx))
                    df = field_set(df, name, gated(val, F.lit(None)))
            elif a.action == "convert":
                spark_type = {"int": "long", "double": "double", "string": "string"}[
                    a.converted_type or "string"
                ]
                cur = field_get(a.key)
                if a.key.split(".")[0] in ("attributes", "resource") and "." in a.key:
                    # string map: converting in place is a no-op textually;
                    # promote to a typed top-level column instead
                    col_name = a.key.split(".", 1)[1]
                    df = df.withColumn(col_name, gated(cur.cast(spark_type), F.lit(None)))
                else:
                    df = field_set(df, a.key, gated(cur.cast(spark_type), cur))
            else:
                raise ValueError(f"unknown action {a.action}")
        return df
