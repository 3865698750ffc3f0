"""Routing connector: condition table -> named pipelines (fan-out).

Reference semantics (connector/routingconnector/logs.go:62-119,
config.go:22-47):
- ordered routing table of conditions -> pipeline names
- ``match_once=True``: FIRST matching route wins per group (when-chain)
- ``match_once=False``: a row is duplicated to EVERY matching route
- rows matching no route go to ``default_pipelines``
- ``error_mode=ignore``: a condition that errors routes to default
  (here: conditions are null-safe — null/invalid evaluates False)

Spark plan (SURVEY.md 3.3): conditions compile to boolean Columns once.
match_once -> a single mutually-exclusive ``route`` tag column; zero
extra shuffle, per-sink writes reuse one tagged frame (ideally via
``partitionBy(route)`` on write). multi-match -> one boolean flag column
per route + an ``array/explode`` expansion so the fan-out is STILL a
single pass over the input (no N full scans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ROUTE = "__default__"


@dataclass
class Route:
    condition: str  # SQL predicate over the frame's columns
    sink: str


@dataclass
class RoutingConnector:
    table: list[Route]
    default_sinks: list[str] = field(default_factory=lambda: [DEFAULT_ROUTE])
    match_once: bool = True
    route_col: str = "route"
    language: str = "sql"  # sql | ottl — reference tables are
    #                        `route() where <OTTL condition>` strings

    def __post_init__(self):
        if self.language not in ("sql", "ottl"):
            raise ValueError("language must be 'sql' or 'ottl'")

    def _conds(self, df: DataFrame | None = None):
        if self.language == "ottl":
            from ..functions import compile_condition

            return [
                (
                    F.coalesce(compile_condition(r.condition, df), F.lit(False)),
                    r.sink,
                )
                for r in self.table
            ]
        return [
            (F.coalesce(F.expr(r.condition), F.lit(False)), r.sink) for r in self.table
        ]

    def __call__(self, df: DataFrame) -> DataFrame:
        """Tag rows with their route(s). match_once: adds one ``route``
        string column. multi-match: one row per (row x matched route) via
        explode of the matched-sink array (rows with no match explode to
        the default sinks)."""
        conds = self._conds(df)
        if self.match_once:
            expr = None
            for cond, sink in conds:
                expr = F.when(cond, sink) if expr is None else expr.when(cond, sink)
            tag = expr.otherwise(F.lit(self.default_sinks[0])) if expr is not None else F.lit(self.default_sinks[0])
            return df.withColumn(self.route_col, tag)
        matched = F.array_compact(
            F.array(*[F.when(cond, F.lit(sink)) for cond, sink in conds])
        )
        # dedupe sinks hit by several routes: a group is delivered once
        # per consumer (logs.go:63-67 batching per consumer)
        matched = F.array_distinct(matched)
        routes = F.when(F.size(matched) > 0, matched).otherwise(
            F.array(*[F.lit(s) for s in self.default_sinks])
        )
        return df.withColumn(self.route_col, F.explode(routes))

    def sinks(self) -> list[str]:
        names = [r.sink for r in self.table]
        for s in self.default_sinks:
            if s not in names:
                names.append(s)
        return names

    def split(self, df: DataFrame) -> dict[str, DataFrame]:
        """Per-sink DataFrames filtered from ONE tagged frame. Callers
        writing all sinks should prefer ``tagged.write.partitionBy(route)``
        which materializes every sink in a single job."""
        tagged = self(df)
        return {
            s: tagged.filter(F.col(self.route_col) == s).drop(self.route_col)
            for s in self.sinks()
        }
