"""Count connector: conditional counts grouped by attributes -> metrics.

Reference semantics (connector/countconnector/counter.go:38-128,
config.go:29,43-51,186-192):
- several named metrics counted in ONE pass
- each metric: optional OTTL conditions (OR-joined) gate which rows count
- optional grouping attributes; a missing attr with a ``default_value``
  falls into the default bucket; missing with NO default -> row EXCLUDED
  from that metric (counter.go:70-73)
- default metric name ``log.record.count``
- output: delta monotonic Sum datapoints keyed by (metric x attr-set)

Spark plan: ONE aggregation pass for every metric def via GROUPING SETS
(one set per distinct grouping-key signature), ``sum(when(cond,1))``
per metric, ``grouping_id()`` to route output rows back to their
metric. One scan + one shuffle total; partial map-side combine is
automatic. Output schema matches FIXTURES.md section 5:
``metric_name, attrs MAP<STRING,STRING>, count``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

DEFAULT_METRIC = "log.record.count"

# per-signal default metric names (config.go:19-29): the connector is
# frame-agnostic here — a span, span-event, metric, datapoint or log
# frame all count the same way; the signal only picks the default name
SIGNAL_DEFAULT_METRICS = {
    "spans": "trace.span.count",
    "spanevents": "trace.span.event.count",
    "metrics": "metric.count",
    "datapoints": "metric.datapoint.count",
    "logs": DEFAULT_METRIC,
}


@dataclass
class MetricDef:
    name: str = DEFAULT_METRIC
    conditions: list[str] = field(default_factory=list)  # OR-joined SQL predicates
    attributes: list[tuple[str, str | None]] = field(default_factory=list)
    # [(attr_key_or_column, default_value_or_None)]


@dataclass
class CountConnector:
    metrics: list[MetricDef] = field(default_factory=lambda: [MetricDef()])
    language: str = "sql"  # sql | ottl — reference MetricInfo.Conditions
    #                        are OTTL strings (config.go:43-51)

    def __post_init__(self):
        if self.language not in ("sql", "ottl"):
            raise ValueError("language must be 'sql' or 'ottl'")

    @staticmethod
    def _attr_col(df: DataFrame, key: str):
        if key in df.columns:
            return F.col(key).cast("string")
        if "attributes" in df.columns:
            return try_element_at(F.col("attributes"), key)
        return F.lit(None).cast("string")

    def __call__(self, df: DataFrame) -> DataFrame:
        # ALL metrics are computed in ONE aggregation pass using
        # GROUPING SETS (one signature per distinct grouping-key set):
        # one scan of the input + one shuffle regardless of how many
        # metric defs are configured — the reference accumulates all
        # counters in a single pass too (counter.go:38-106). grouping_id
        # disambiguates which signature produced each output row.
        pairs: list[tuple[str, str | None]] = []
        for m in self.metrics:
            for kd in m.attributes:
                if kd not in pairs:
                    pairs.append(kd)
        if not pairs:
            return self._global_counts(df)
        colname = {kd: f"__k_{i}" for i, kd in enumerate(pairs)}
        key_cols = []
        for kd in pairs:
            key, default = kd
            col = self._attr_col(df, key)
            if default is not None:
                col = F.coalesce(col, F.lit(default))
            key_cols.append(col.alias(colname[kd]))
        flags = []
        for i, m in enumerate(self.metrics):
            flag = self._metric_flag(df, m)
            # missing attr with no default -> row excluded from THIS
            # metric only (counter.go:70-73)
            for key, default in m.attributes:
                if default is None:
                    flag = F.when(
                        self._attr_col(df, key).isNotNull(), flag
                    ).otherwise(F.lit(0))
            flags.append(flag.alias(f"__m_{i}"))
        proj = df.select(*key_cols, *flags)

        all_cols = [colname[kd] for kd in pairs]
        # canonicalize each metric's grouping columns to all_cols order:
        # uniq_sets dedups by LIST while mask() is order-insensitive, so
        # two metrics listing the same attrs in different order would
        # otherwise create two identical GROUPING SETS whose rows both
        # pass both metrics' gid check — every count emitted twice
        metric_cols = [
            sorted(
                [colname[kd] for kd in m.attributes], key=all_cols.index
            )
            for m in self.metrics
        ]
        uniq_sets: list[list[str]] = []
        for g in metric_cols:
            if g not in uniq_sets:
                uniq_sets.append(g)
        agg = proj.groupingSets(
            [[F.col(c) for c in g] for g in uniq_sets],
            *[F.col(c) for c in all_cols],
        ).agg(
            F.grouping_id().alias("__gid"),
            *[
                F.sum(F.col(f"__m_{i}")).alias(f"__c_{i}")
                for i in range(len(self.metrics))
            ],
        )

        def mask(cols: list[str]) -> int:
            bits = 0
            for idx, c in enumerate(all_cols):
                if c not in cols:
                    bits |= 1 << (len(all_cols) - 1 - idx)
            return bits

        # ONE output projection, not a per-metric filter + Union: a
        # Union's branches are column-pruned independently (branch i
        # keeps only __c_i), the pruned aggregates no longer match, and
        # exchange reuse dies — the measured result was the ENTIRE
        # upstream (scan + derive + agg) executing once PER METRIC.
        # Building a per-row array of metric structs and exploding keeps
        # a single aggregation subtree: one scan, one shuffle, however
        # many metrics are configured.
        elems = []
        for i, m in enumerate(self.metrics):
            attr_map = (
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k, _ in m.attributes]),
                    F.array(*[F.col(colname[kd]) for kd in m.attributes]),
                )
                if m.attributes
                else F.from_json(F.lit("{}"), "map<string,string>")
            )
            cnt = F.col(f"__c_{i}").cast("long")
            elems.append(
                F.when(
                    (F.col("__gid") == mask(metric_cols[i])) & (cnt > 0),
                    F.struct(
                        F.lit(m.name).alias("metric_name"),
                        attr_map.alias("attrs"),
                        cnt.alias("count"),
                    ),
                )
            )
        return (
            agg.select(
                F.explode(F.array_compact(F.array(*elems))).alias("__out")
            )
            .select("__out.metric_name", "__out.attrs", "__out.count")
        )

    def _global_counts(self, df: DataFrame) -> DataFrame:
        agg = df.select(
            *[self._metric_flag(df, m).alias(f"__m_{i}") for i, m in enumerate(self.metrics)]
        ).agg(
            *[F.sum(F.col(f"__m_{i}")).alias(f"__c_{i}") for i in range(len(self.metrics))]
        )
        empty = F.from_json(F.lit("{}"), "map<string,string>")
        # same single-subtree posture as the grouped path (here the agg
        # is one row, but a Union would still re-run the whole scan per
        # metric to produce it)
        elems = [
            F.when(
                F.col(f"__c_{i}").cast("long") > 0,
                F.struct(
                    F.lit(m.name).alias("metric_name"),
                    empty.alias("attrs"),
                    F.col(f"__c_{i}").cast("long").alias("count"),
                ),
            )
            for i, m in enumerate(self.metrics)
        ]
        return (
            agg.select(
                F.explode(F.array_compact(F.array(*elems))).alias("__out")
            )
            .select("__out.metric_name", "__out.attrs", "__out.count")
        )

    def _metric_flag(self, df: DataFrame, m: MetricDef):
        if not m.conditions:
            return F.lit(1)
        cond = F.lit(False)
        for c in m.conditions:
            if self.language == "ottl":
                from ..functions import compile_condition

                compiled = compile_condition(c, df)
            else:
                compiled = F.expr(c)
            cond = cond | F.coalesce(compiled, F.lit(False))
        return cond.cast("int")
