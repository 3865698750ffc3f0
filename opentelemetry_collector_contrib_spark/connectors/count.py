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

Spark plan: one ``groupBy(attrs).agg(sum(when(cond,1)))`` per distinct
grouping-key-set; metrics sharing a key-set share a single aggregation
(partial map-side combine is automatic). Output schema matches
FIXTURES.md section 5: ``metric_name, attrs MAP<STRING,STRING>, count``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import groupby

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_METRIC = "log.record.count"


@dataclass
class MetricDef:
    name: str = DEFAULT_METRIC
    conditions: list[str] = field(default_factory=list)  # OR-joined SQL predicates
    attributes: list[tuple[str, str | None]] = field(default_factory=list)
    # [(attr_key_or_column, default_value_or_None)]


@dataclass
class CountConnector:
    metrics: list[MetricDef] = field(default_factory=lambda: [MetricDef()])

    @staticmethod
    def _attr_col(df: DataFrame, key: str):
        if key in df.columns:
            return F.col(key).cast("string")
        if "attributes" in df.columns:
            return F.element_at(F.col("attributes"), key)
        return F.lit(None).cast("string")

    def __call__(self, df: DataFrame) -> DataFrame:
        outs = []
        # group metric defs by their grouping-key signature so each
        # signature costs one aggregation over the input
        sig_fn = lambda m: tuple((k, d if d is not None else "\x00") for k, d in m.attributes)  # noqa: E731
        keyed = sorted(self.metrics, key=sig_fn)
        for sig, defs in groupby(keyed, key=sig_fn):
            defs = list(defs)
            base = df
            key_cols = []
            for key, default in defs[0].attributes:
                col = self._attr_col(df, key)
                if default is not None:
                    col = F.coalesce(col, F.lit(default))
                key_cols.append(col.alias(f"__k_{key}"))
            proj = base.select(
                *key_cols,
                *[
                    self._metric_flag(df, m).alias(f"__m_{i}")
                    for i, m in enumerate(defs)
                ],
            )
            # missing attr with no default -> excluded (counter.go:70-73)
            for key, default in defs[0].attributes:
                if default is None:
                    proj = proj.filter(F.col(f"__k_{key}").isNotNull())
            gcols = [f"__k_{k}" for k, _ in defs[0].attributes]
            agg = proj.groupBy(*gcols).agg(
                *[F.sum(F.col(f"__m_{i}")).alias(f"__c_{i}") for i in range(len(defs))]
            )
            attr_map = (
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k, _ in defs[0].attributes]),
                    F.array(*[F.col(f"__k_{k}") for k, _ in defs[0].attributes]),
                )
                if defs[0].attributes
                else F.from_json(F.lit("{}"), "map<string,string>")
            )
            for i, m in enumerate(defs):
                outs.append(
                    agg.select(
                        F.lit(m.name).alias("metric_name"),
                        attr_map.alias("attrs"),
                        F.col(f"__c_{i}").cast("long").alias("count"),
                    ).filter(F.col("count") > 0)
                )
        result = outs[0]
        for o in outs[1:]:
            result = result.unionByName(o)
        return result

    def _metric_flag(self, df: DataFrame, m: MetricDef):
        if not m.conditions:
            return F.lit(1)
        cond = F.lit(False)
        for c in m.conditions:
            cond = cond | F.coalesce(F.expr(c), F.lit(False))
        return cond.cast("int")
