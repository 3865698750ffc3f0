"""Attributes/resource processor: ordered action list over metadata.

Reference semantics: internal/coreinternal/attraction/attraction.go —
actions ``insert`` (only if absent, :106-140), ``update`` (only if
present), ``upsert``, ``delete``, ``hash`` (SHA2-256 over type-tagged
bytes, hasher.go:29-58: string=utf8, bool=1 byte, int/double=8-byte
LITTLE-endian), ``extract`` (regex named groups -> new attrs,
:235-260), ``convert`` (type_converter.go:19-76 — a failed string
parse KEEPS the original value),
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

from ..envelope import _split, field_delete, field_get, field_set


def _le_hex64(h: Column) -> Column:
    """Byte-swap a 16-hex-digit string to little-endian order."""
    return F.concat(*[F.substring(h, i, 2) for i in range(15, 0, -2)])


def sha256_typed(col: Column, dtype: str) -> Column:
    """SHA2-256 with the reference's per-type byte encoding
    (attraction/hasher.go:29-58): string = raw utf8; bool = one 0/1
    byte; int = 8-byte little-endian two's complement; double = 8-byte
    little-endian IEEE-754 bits. Verified against the exact digests in
    attributes_log_test.go TestLogAttributes_Hash. All JVM-side — the
    double bit-pattern comes from `reflect('java.lang.Double',
    'doubleToRawLongBits', x)`, not Python."""
    if dtype == "boolean":
        # null propagates (reference hashes only attributes that exist);
        # a bare otherwise('00') would give null rows the FALSE digest
        byte = F.when(col, F.lit("01")).when(~col, F.lit("00"))
        return F.sha2(F.unhex(byte), 256)
    if dtype in ("bigint", "int", "smallint", "tinyint"):
        h = F.lpad(F.hex(col.cast("long")), 16, "0")
        return F.sha2(F.unhex(_le_hex64(h)), 256)
    if dtype in ("double", "float"):
        bits = F.call_function(
            "reflect",
            F.lit("java.lang.Double"),
            F.lit("doubleToRawLongBits"),
            col.cast("double"),
        ).cast("long")
        return F.sha2(F.unhex(_le_hex64(F.lpad(F.hex(bits), 16, "0"))), 256)
    return F.sha2(col.cast("string"), 256)


_BOOL_SHAPE = "^(true|false)$"
_INT_SHAPE = r"^-?\d+$"


def convert_in_map(s: Column, target: str) -> Column:
    """``convert`` for a ``map<string,string>`` attribute entry: the
    stringly-typed restatement of type_converter.go's pcommon.Value
    switch. Value SHAPE stands in for the pcommon type tag (our
    renderers emit "true"/"false" for bools, bare digits for ints),
    the parsed value is re-rendered into the map, and — like the
    reference — an unparseable string KEEPS its original value."""
    if target == "string":
        return s
    if target == "int":
        from_bool = F.when(s == "true", F.lit("1")).otherwise(F.lit("0"))
        return (
            F.when(s.rlike(_BOOL_SHAPE), from_bool)
            .when(
                s.try_cast("long").isNotNull(),
                s.try_cast("long").cast("string"),
            )
            .when(  # double-shaped: int64(d) truncation, Go int64()
                s.try_cast("double").isNotNull(),
                s.try_cast("double").cast("long").cast("string"),
            )
            .otherwise(s)
        )
    if target == "double":
        from_bool = F.when(s == "true", F.lit("1.0")).otherwise(F.lit("0.0"))
        return (
            F.when(s.rlike(_BOOL_SHAPE), from_bool)
            .when(s.rlike(_INT_SHAPE), s)  # renders without a ".0" in Go
            .when(
                s.try_cast("double").isNotNull(),
                s.try_cast("double").cast("string"),
            )
            .otherwise(s)
        )
    raise ValueError(f"unknown converted_type {target}")


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
    include: object | None = None  # SQL predicate string OR a
    #   Log/Span/MetricMatchProperties (the reference's MatchConfig
    #   include block, attraction/config.go): record must match to be
    #   touched
    exclude: object | None = None  # same forms; matching records skipped

    @staticmethod
    def _props(p) -> Column | None:
        return F.expr(p) if isinstance(p, str) else p.compile()

    def _guard(self) -> Column | None:
        conds = []
        if self.include is not None:
            inc = self._props(self.include)
            if inc is not None:  # empty properties object = absent matcher
                conds.append(F.coalesce(inc, F.lit(False)))
        if self.exclude is not None:
            exc = self._props(self.exclude)
            if exc is not None:
                conds.append(~F.coalesce(exc, F.lit(False)))
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
                try:
                    dtype = df.select(cur).schema[0].dataType.simpleString()
                except Exception:
                    dtype = "string"
                df = field_set(df, a.key, gated(sha256_typed(cur, dtype), cur))
            elif a.action == "extract":
                if not a.pattern:
                    raise ValueError("extract requires pattern")
                py = (
                    a.pattern.replace("(?<", "(?P<")
                    .replace("(?P<=", "(?<=")
                    .replace("(?P<!", "(?<!")
                )
                groups = _re.compile(py).groupindex
                jvm = _re.sub(r"\(\?P<", "(?<", a.pattern)
                jvm = _re.sub(r"\(\?<(?![=!])[^>]*>", "(", jvm)
                src = field_get(a.key)
                for name, idx in groups.items():
                    ok = src.rlike(jvm)
                    # non-matching rows keep their current value —
                    # extractAttributes returns without modifying when
                    # the pattern does not match (attraction.go)
                    try:
                        current = field_get(name)
                        df.select(current)
                    except Exception:
                        current = F.lit(None)
                    val = F.when(ok, F.regexp_extract(src, jvm, idx)).otherwise(
                        current
                    )
                    df = field_set(df, name, gated(val, current))
            elif a.action == "convert":
                spark_type = {"int": "long", "double": "double", "string": "string"}[
                    a.converted_type or "string"
                ]
                cur = field_get(a.key)
                key_parts = _split(a.key)
                if key_parts[0] in ("attributes", "resource") and len(key_parts) > 1:
                    # string map: convert IN PLACE with the reference's
                    # keep-on-parse-failure rule (type_converter.go),
                    # re-rendered as a string; ALSO promote to a typed
                    # top-level column for downstream typed use (null
                    # where the parse failed — a typed column can't
                    # hold the kept original)
                    df = field_set(
                        df,
                        a.key,
                        gated(convert_in_map(cur, a.converted_type or "string"), cur),
                    )
                    col_name = ".".join(key_parts[1:])
                    df = df.withColumn(
                        col_name, gated(cur.try_cast(spark_type), F.lit(None))
                    )
                else:
                    df = field_set(df, a.key, gated(cur.cast(spark_type), cur))
            else:
                raise ValueError(f"unknown action {a.action}")
        return df
