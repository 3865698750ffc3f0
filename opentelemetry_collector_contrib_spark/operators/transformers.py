"""Transform operators (stanza transformer semantics, SURVEY.md 2.3).

Each is a pure projection/filter over the DataFrame; field paths use the
entry path language (envelope.field_get/field_set).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import field_delete, field_get, field_set


@dataclass
class Add:
    """Set field to a literal or SQL expression result
    (transformer/add/transformer.go:18-51)."""

    field: str
    value: object = None
    expr: str | None = None
    if_expr: str | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        val = F.expr(self.expr) if self.expr is not None else F.lit(self.value)
        if self.if_expr is not None:
            current = (
                field_get(self.field)
                if self.field.split(".")[0] in df.columns
                else F.lit(None)
            )
            val = F.when(F.expr(self.if_expr), val).otherwise(current)
        return field_set(df, self.field, val)


@dataclass
class Remove:
    """Delete a field, or all attributes/resource
    (transformer/remove/transformer.go)."""

    field: str

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.field in ("attributes", "resource"):
            return df.withColumn(
                self.field, F.from_json(F.lit("{}"), "map<string,string>")
            )
        return field_delete(df, self.field)


@dataclass
class Copy:
    """Copy field From -> To (transformer/copy/transformer.go)."""

    from_field: str
    to_field: str

    def __call__(self, df: DataFrame) -> DataFrame:
        return field_set(df, self.to_field, field_get(self.from_field))


@dataclass
class Move:
    """Rename/move a field (transformer/move/transformer.go)."""

    from_field: str
    to_field: str

    def __call__(self, df: DataFrame) -> DataFrame:
        out = field_set(df, self.to_field, field_get(self.from_field))
        return field_delete(out, self.from_field)


@dataclass
class Retain:
    """Keep only the listed fields (transformer/retain/transformer.go:18-56)."""

    fields: list[str]

    def __call__(self, df: DataFrame) -> DataFrame:
        top = [f for f in self.fields if "." not in f]
        map_keys: dict[str, list[str]] = {}
        for f_ in self.fields:
            if "." in f_:
                head, key = f_.split(".", 1)
                map_keys.setdefault(head, []).append(key)
        out = df
        for head, keys in map_keys.items():
            out = out.withColumn(
                head, F.map_filter(F.col(head), lambda k, _: k.isin(keys))
            )
            top.append(head)
        return out.select(*top)


@dataclass
class Flatten:
    """Hoist a nested map/struct one level up
    (transformer/flatten/transformer.go)."""

    field: str

    def __call__(self, df: DataFrame) -> DataFrame:
        parts = self.field.split(".")
        if len(parts) == 2 and parts[0] in ("attributes", "resource"):
            # flatten attributes.x where x is a JSON map string is out of
            # scope; map-in-map does not occur with string maps
            raise ValueError("flatten of map-nested path unsupported for string maps")
        src = F.col(self.field)
        dtype = dict(df.dtypes)[self.field]
        if dtype.startswith("struct"):
            return df.select("*", f"{self.field}.*").drop(self.field)
        raise ValueError(f"cannot flatten non-struct column {self.field} ({dtype})")


@dataclass
class AssignKeys:
    """Zip a list value with key names -> map
    (transformer/assignkeys/transformer.go)."""

    field: str
    keys: list[str]

    def __call__(self, df: DataFrame) -> DataFrame:
        src = field_get(self.field)
        return field_set(
            df,
            self.field,
            F.map_from_arrays(F.array(*[F.lit(k) for k in self.keys]), src),
        )


@dataclass
class Unquote:
    """Strip wrapping quotes from a string field
    (transformer/unquote/transformer.go)."""

    field: str

    def __call__(self, df: DataFrame) -> DataFrame:
        src = field_get(self.field)
        unquoted = F.when(
            src.rlike(r'^".*"$') | src.rlike(r"^'.*'$"),
            src.substr(F.lit(2), F.length(src) - 2),
        ).otherwise(src)
        return field_set(df, self.field, unquoted)


@dataclass
class Filter:
    """DROP rows matching expr — inverse filter
    (transformer/filter/transformer.go:26-57). ``drop_ratio`` samples the
    matching rows deterministically (hash of all columns, not rand(), so
    reruns are idempotent — required for resume semantics)."""

    expr: str
    drop_ratio: float = 1.0

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = F.expr(self.expr)
        if self.drop_ratio >= 1.0:
            return df.filter(~F.coalesce(cond, F.lit(False)))
        threshold = int(self.drop_ratio * 10000)
        # xxhash64 rejects MAP columns (unorderable) — serialize them to
        # JSON for the hash so envelope frames (attributes/resource maps)
        # can use sampled drops at all; to_json is deterministic for the
        # same map contents per-row build order, which reruns reproduce
        hash_cols = [
            F.to_json(F.col(c)) if t.startswith("map<") else F.col(c)
            for c, t in df.dtypes
        ]
        sampled = F.pmod(F.xxhash64(*hash_cols), 10000) < threshold
        return df.filter(~(F.coalesce(cond, F.lit(False)) & sampled))


@dataclass
class Router:
    """First-match-wins route tagging
    (transformer/router/transformer.go:38-64: ordered expr list, break on
    match, optional default). Emits a ``route`` column via a mutually
    exclusive when-chain — single pass, no shuffle; downstream writers
    filter or partitionBy on it."""

    routes: list[tuple[str, str]]  # (expr, route_name) in priority order
    default: str | None = "default"
    route_col: str = "route"

    def __call__(self, df: DataFrame) -> DataFrame:
        expr = None
        for cond_str, name in self.routes:
            cond = F.coalesce(F.expr(cond_str), F.lit(False))
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        tagged = expr.otherwise(F.lit(self.default))
        out = df.withColumn(self.route_col, tagged)
        if self.default is None:
            out = out.filter(F.col(self.route_col).isNotNull())
        return out


@dataclass
class Noop:
    """Identity (transformer/noop/transformer.go)."""

    def __call__(self, df: DataFrame) -> DataFrame:
        return df
