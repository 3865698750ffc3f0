"""Filter processor: drop records matching OR-joined conditions.

Reference: processor/filterprocessor/logs.go:67-96 (RemoveIf cascade over
OTTL conditions) + telemetry counting of dropped records
(telemetry.go:60-99). Conditions are OR-joined
(internal/filter/filterlog/filterlog.go:30-130).

The dropped-count telemetry maps to ``df.observe`` (metrics.py collects
it) — no extra action/pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


@dataclass
class FilterProcessor:
    conditions: list[str]          # OR-joined predicates; match -> DROP
    observe_name: str | None = None  # emit <name>.filtered count via observe()
    language: str = "sql"          # sql | ottl — the reference's conditions
    #                                ARE OTTL (filterprocessor config
    #                                `logs.log_record` statements); "ottl"
    #                                routes them through compile_condition

    def __post_init__(self):
        if self.language not in ("sql", "ottl"):
            raise ValueError("language must be 'sql' or 'ottl'")

    def matched(self, df: DataFrame | None = None) -> F.Column:
        cond = F.lit(False)
        for c in self.conditions:
            if self.language == "ottl":
                from ..functions import compile_condition

                compiled = compile_condition(c, df)
            else:
                compiled = F.expr(c)
            cond = cond | F.coalesce(compiled, F.lit(False))
        return cond

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = self.matched(df)
        if self.observe_name:
            obs = Observation(self.observe_name)
            df = df.observe(
                obs,
                F.sum(cond.cast("long")).alias("filtered"),
                F.count(F.lit(1)).alias("seen"),
            )
            self.observation = obs
        return df.filter(~cond)
