"""Schema processor: OTel schema-version translation.

Reference: processor/schemaprocessor — the shipped transformer is a
declared no-op (transformer.go:38-48 returns data unchanged), but the
package's translation core is fully specified and tested:
- internal/migrate/attributes.go:42-84 — AttributeChangeSet.Apply/
  Rollback: each ORIGINAL key is renamed at most once (no cascading,
  "naming loop" test), and on a conflict the REWRITE wins: a
  pre-existing entry under the target key is dropped (error recorded).
- internal/migrate/conditional.go — conditional sets apply only when
  the signal name is in the apply_to list (empty list = always).
- internal/migrate/signal.go — signal (metric/event) name renames,
  reversed on rollback.
- internal/translation/revision_v1.go:14-43 — a schema VERSION bundles
  change groups: ``all``, ``resources``, ``spans`` (conditional),
  span-event names/attrs, ``metrics`` (names + conditional attrs).
  Upgrading applies revisions ascending; downgrading rolls back
  descending, each change-set slice reversed.

This implementation wires those tested semantics into a working
columnar processor (strictly more than the reference pipeline does
today): the telemetry's source version parses from ``schema_url``
per row, and every revision between source and target becomes a
conditionally-gated map/name rewrite — pure Column expressions, zero
shuffle, rows at different versions handled in one pass. ``logs``
change groups are honored too (the OTel schema spec defines them;
revision_v1.go simply has no logs field yet).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at


def parse_version(v: str) -> tuple[int, ...]:
    return tuple(int(p) for p in v.split("."))


def _rename_map_staged(
    df: DataFrame, target_col: str, mapping: dict[str, str], cond: Column
) -> DataFrame:
    """Staged AttributeChangeSet.do rename used by the
    processor: the renamed-entry array and the kept-entry array are
    MATERIALIZED as staged columns so every lambda's input is a plain
    attribute reference — the sibling-chained filter-over-transform
    shape (and a when() wrapping it) can misevaluate nondeterministically
    on classic PySpark 4.1, whose lambdas all share variable names
    x/y/z (see processors/expo.py collapse)."""
    if not mapping:
        return df
    table = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    entries = F.map_entries(F.col(target_col))
    df = df.withColumn(
        "__sch_ren__",
        F.transform(
            entries,
            lambda e: F.struct(
                F.coalesce(
                    try_element_at(table, e.getField("key")), e.getField("key")
                ).alias("key"),
                e.getField("value").alias("value"),
                try_element_at(table, e.getField("key")).isNotNull().alias("ren"),
            ),
        ),
    )
    ren = F.col("__sch_ren__")
    df = df.withColumn(
        "__sch_kept__",
        F.filter(
            ren,
            lambda e, idx: F.when(
                e.getField("ren"),
                # last renamed entry with this key wins
                ~F.exists(
                    F.slice(ren, idx + 2, F.greatest(F.size(ren), F.lit(1))),
                    lambda o: o.getField("ren")
                    & (o.getField("key") == e.getField("key")),
                ),
            ).otherwise(
                # non-renamed entry dropped when any rename claims its key
                ~F.exists(
                    ren,
                    lambda o: o.getField("ren")
                    & (o.getField("key") == e.getField("key")),
                )
            ),
        ),
    )
    kept = F.col("__sch_kept__")
    # two transforms over the staged attribute (also keeps it referenced
    # twice so CollapseProject won't re-inline the filter chain)
    new_map = F.map_from_arrays(
        F.transform(kept, lambda e: e.getField("key")),
        F.transform(kept, lambda e: e.getField("value")),
    )
    return df.withColumn(
        target_col, F.when(cond, new_map).otherwise(F.col(target_col))
    ).drop("__sch_ren__", "__sch_kept__")


def _rename_name(name: Column, mapping: dict[str, str]) -> Column:
    if not mapping:
        return name
    table = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return F.coalesce(try_element_at(table, name), name)


def _invert(mapping: dict[str, str]) -> dict[str, str]:
    return {v: k for k, v in mapping.items()}


@dataclass
class SchemaProcessor:
    """``versions``: the schema file's ``versions`` mapping, dicts in
    the OTel schema-file YAML shape, e.g.::

        {"1.1.0": {"all": {"changes": [
              {"rename_attributes": {"attribute_map": {"old": "new"}}}]},
          "1.2.0": {"metrics": {"changes": [
              {"rename_metrics": {"m.old": "m.new"}},
              {"rename_attributes": {"attribute_map": {...},
                                     "apply_to_metrics": ["m.new"]}}]}}}

    ``signal`` selects which signal-scoped change groups apply on top of
    ``all`` + ``resources``: "log" | "span" | "metric".
    """

    versions: dict[str, dict]
    target: str
    signal: str = "log"
    schema_url_col: str = "schema_url"
    attrs_col: str = "attributes"
    resource_col: str | None = None
    name_col: str | None = None  # span / metric name for conditions + renames

    def __post_init__(self):
        if self.signal not in ("log", "span", "metric"):
            raise ValueError("signal must be log, span or metric")
        self._order = sorted(self.versions, key=parse_version)
        if self.target not in self._order:
            # the target itself may carry no changes; it still anchors
            # the walk
            self._order = sorted({*self._order, self.target}, key=parse_version)
        self._idx = {v: i for i, v in enumerate(self._order)}

    def _row_version_idx(self) -> Column:
        ver = F.regexp_extract(F.col(self.schema_url_col), r"([0-9.]+)$", 1)
        expr = F.when(F.lit(False), F.lit(None))
        for v, i in self._idx.items():
            expr = expr.when(ver == v, F.lit(i))
        return expr.otherwise(F.lit(None))

    def _changes(self, rev: dict, group: str) -> list[dict]:
        return (rev.get(group) or {}).get("changes", [])

    def _apply_revision(self, df: DataFrame, rev: dict, gate: Column, up: bool) -> DataFrame:
        signal_group = {"log": "logs", "span": "spans", "metric": "metrics"}[self.signal]
        groups = ["all", "resources", signal_group]
        if not up:
            groups = list(reversed(groups))
        out = df
        for g in groups:
            changes = self._changes(rev, g)
            if not up:
                changes = list(reversed(changes))
            for ch in changes:
                ra = ch.get("rename_attributes")
                if ra:
                    mapping = ra.get("attribute_map", {})
                    if not up:
                        mapping = _invert(mapping)
                    applies = ra.get("apply_to_spans") or ra.get("apply_to_metrics")
                    target_col = (
                        self.resource_col if g == "resources" else self.attrs_col
                    )
                    if target_col is None or target_col not in out.columns:
                        continue
                    cond = gate
                    if applies:
                        if not self.name_col:
                            # conditional.go applies ONLY to the named
                            # signals; with no name column nothing can
                            # match — skipping (not broadening to every
                            # row) is the faithful reading
                            continue
                        cond = cond & F.col(self.name_col).isin(list(applies))
                    out = _rename_map_staged(out, target_col, mapping, cond)
                rm = ch.get("rename_metrics")
                if rm and self.signal == "metric" and self.name_col:
                    mapping = rm if up else _invert(rm)
                    out = out.withColumn(
                        self.name_col,
                        F.when(
                            gate, _rename_name(F.col(self.name_col), mapping)
                        ).otherwise(F.col(self.name_col)),
                    )
        return out

    def __call__(self, df: DataFrame) -> DataFrame:
        tgt = self._idx[self.target]
        out = df.withColumn("__sv__", self._row_version_idx())
        sv = F.col("__sv__")
        # upgrades: revisions with src < i <= target, ascending
        for v in self._order:
            i = self._idx[v]
            rev = self.versions.get(v, {})
            gate = sv.isNotNull() & (sv < i) & (F.lit(i) <= tgt)
            out = self._apply_revision(out, rev, gate, up=True)
        # downgrades: revisions with target < i <= src, DESCENDING
        for v in reversed(self._order):
            i = self._idx[v]
            rev = self.versions.get(v, {})
            gate = sv.isNotNull() & (F.lit(tgt) < i) & (i <= sv)
            out = self._apply_revision(out, rev, gate, up=False)
        # stamp the new schema url by replacing the version suffix
        out = out.withColumn(
            self.schema_url_col,
            F.when(
                sv.isNotNull(),
                F.regexp_replace(
                    F.col(self.schema_url_col), r"[0-9.]+$", self.target
                ),
            ).otherwise(F.col(self.schema_url_col)),
        )
        return out.drop("__sv__")
