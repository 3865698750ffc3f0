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

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ROUTE = "__default__"


def _top_level_where(statement: str) -> tuple[int, int] | None:
    """(start, end) span of the first depth-0 ``where`` keyword, found
    with the OTTL token regex (string literals are single tokens, so
    'where' INSIDE an argument string never matches)."""
    from ..functions.ast import _TOKEN_RE

    depth, i = 0, 0
    while i < len(statement):
        m = _TOKEN_RE.match(statement, i)
        if not m:
            return None  # untokenizable tail: fall back to no-where
        tok = m.group()
        if m.lastgroup == "op":
            if tok in "([":
                depth += 1
            elif tok in ")]":
                depth -= 1
        elif m.lastgroup == "ident" and tok == "where" and depth == 0:
            return (m.start(), m.end())
        i = m.end()
    return None


@dataclass
class Route:
    condition: str       # SQL/OTTL predicate over the frame's columns
    sink: str | list[str]  # one pipeline or the statement's pipeline LIST
    editor: str | None = None  # full OTTL statement applied to matched rows
    #                            (config Statement like `delete_key(attributes,
    #                            "X-Tenant") where ...` routes AND mutates)

    @property
    def sink_list(self) -> list[str]:
        return self.sink if isinstance(self.sink, list) else [self.sink]

    @classmethod
    def from_statement(cls, statement: str, pipelines: list[str]) -> "Route":
        """Reference routing-table entry -> Route.

        ``route() where C`` is pure routing; any other editor call with a
        ``where`` clause (e.g. ``delete_key(attributes, "X-Tenant") where
        C``) routes on C and applies the editor to matched rows
        (connector/routingconnector/config.go:22-47). The where split
        uses the OTTL tokenizer, so a string argument containing the
        word ``where`` cannot hijack the condition."""
        cut = _top_level_where(statement)
        if cut is None:
            return cls("true", pipelines, editor=statement)
        head, cond = statement[: cut[0]].strip(), statement[cut[1]:].strip()
        if re.fullmatch(r"route\(\s*\)", head):
            return cls(cond, pipelines)
        return cls(cond, pipelines, editor=statement)


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
                    r.sink_list,
                )
                for r in self.table
            ]
        return [
            (F.coalesce(F.expr(r.condition), F.lit(False)), r.sink_list)
            for r in self.table
        ]

    def _apply_editors(self, df: DataFrame) -> DataFrame:
        """Statements with editors mutate the rows whose group MATCHED
        that route (the ``__match_<i>__`` flags stamped pre-mutation at
        tagging time), conjoined with the editor's own ``where``.

        Reference semantics (routingconnector logs.go): match_once
        breaks after the first matching statement, so a later route's
        editor never touches a group an earlier route claimed — the
        match_once flags encode first-match-wins. In multi-match mode
        every matching statement's editor runs on the delivered group
        (cumulative), so each exploded copy carries ALL its matched
        routes' mutations."""
        from ..functions import compile_statement, drop_cache_columns

        for i, r in enumerate(self.table):
            if r.editor is not None:
                df = compile_statement(
                    r.editor, extra_where=F.col(f"__match_{i}__")
                )(df)
        df = df.drop(*[f"__match_{i}__" for i in range(len(self.table))])
        return drop_cache_columns(df)

    def _with_match_flags(self, df: DataFrame, conds) -> DataFrame:
        """Stamp per-route matched flags BEFORE mutation/explode: for
        match_once, flag_i = cond_i and no earlier cond (first match
        wins); multi-match, flag_i = cond_i."""
        flags = []
        earlier = None
        for i, (cond, _) in enumerate(conds):
            flag = cond if earlier is None or not self.match_once else (
                cond & ~earlier
            )
            flags.append(F.coalesce(flag, F.lit(False)).alias(f"__match_{i}__"))
            earlier = cond if earlier is None else (earlier | cond)
        return df.select("*", *flags)

    def __call__(self, df: DataFrame) -> DataFrame:
        """Tag rows with their route(s). match_once: FIRST matching
        statement wins, its full pipeline list delivered. multi-match:
        one row per (row x matched pipeline) via explode of the
        flattened matched-sink arrays (rows with no match explode to
        the default sinks; no default -> dropped)."""
        conds = self._conds(df)
        default_arr = (
            F.array(*[F.lit(s) for s in self.default_sinks])
            if self.default_sinks
            else F.expr("cast(array() as array<string>)")
        )
        if self.match_once:
            multi = any(len(sinks) > 1 for _, sinks in conds) or len(
                self.default_sinks
            ) != 1
            if not multi:
                # single-sink fast path: scalar tag, no Generate node
                expr = None
                for cond, sinks in conds:
                    tag_v = F.lit(sinks[0])
                    expr = F.when(cond, tag_v) if expr is None else expr.when(cond, tag_v)
                tag = (
                    expr.otherwise(F.lit(self.default_sinks[0]))
                    if expr is not None
                    else F.lit(self.default_sinks[0])
                )
                out = self._with_match_flags(df, conds).withColumn(
                    self.route_col, tag
                )
                return self._apply_editors(out)
            expr = None
            for cond, sinks in conds:
                arr = F.array(*[F.lit(s) for s in sinks])
                expr = F.when(cond, arr) if expr is None else expr.when(cond, arr)
            routes = expr.otherwise(default_arr) if expr is not None else default_arr
            out = self._with_match_flags(df, conds).withColumn(
                self.route_col, F.explode(routes)
            )
            return self._apply_editors(out)
        matched = F.array_compact(
            F.array(
                *[
                    F.when(cond, F.lit(s))
                    for cond, sinks in conds
                    for s in sinks
                ]
            )
        )
        # dedupe sinks hit by several routes: a group is delivered once
        # per consumer (logs.go:63-67 batching per consumer)
        matched = F.array_distinct(matched)
        routes = F.when(F.size(matched) > 0, matched).otherwise(default_arr)
        out = self._with_match_flags(df, conds).withColumn(
            self.route_col, F.explode(routes)
        )
        return self._apply_editors(out)

    def sinks(self) -> list[str]:
        names: list[str] = []
        for r in self.table:
            for s in r.sink_list:
                if s not in names:
                    names.append(s)
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
