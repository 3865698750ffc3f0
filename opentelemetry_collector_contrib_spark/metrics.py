"""obsreport-style pipeline metrics.

Reference: receivers wrap delivery in StartLogsOp/EndLogsOp counters
(pkg/stanza/adapter/receiver.go:124-131); processors expose counters
like ``processor_filter_logs.filtered`` (filterprocessor/telemetry.go:
60-99). Spark restatement: ``df.observe(name, exprs)`` accumulates
per-stage counters DURING the action with zero extra passes; this
module snapshots them into a metrics table after the run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


@dataclass
class MetricsCollector:
    run_id: str
    observations: dict[str, Observation] = field(default_factory=dict)
    static: list[tuple[str, str, float]] = field(default_factory=list)

    def observe(self, df: DataFrame, stage: str, **exprs) -> DataFrame:
        """Attach counters to a frame; exprs default to a row count."""
        obs = Observation(f"{self.run_id}:{stage}")
        cols = (
            [e.alias(n) for n, e in exprs.items()]
            if exprs
            else [F.count(F.lit(1)).alias("rows")]
        )
        self.observations[stage] = obs
        return df.observe(obs, *cols)

    def add(self, stage: str, metric: str, value: float) -> None:
        self.static.append((stage, metric, float(value)))

    @staticmethod
    def _get_or_none(obs: Observation) -> dict | None:
        """Non-blocking twin of ``Observation.get``.

        ``Observation.get`` BLOCKS until the observed frame's first
        action completes — for a stage whose action never ran (a
        skipped routed branch) it would hang the driver forever. The
        JVM Observation exposes ``getRowOrEmpty`` (Option[Row]); an
        empty option means not-yet-run and is skipped.
        """
        jo = getattr(obs, "_jo", None)
        if jo is None:
            return None  # observe() was never attached to a frame
        jopt = jo.getRowOrEmpty()
        if not jopt.isDefined():
            return None  # action not yet run for this frame
        from pyspark.serializers import CPickleSerializer

        jvm = obs._jvm
        utils = getattr(jvm, "org.apache.spark.sql.api.python.PythonSQLUtils")
        row = CPickleSerializer().loads(utils.toPyRow(jopt.get()))
        return row.asDict(recursive=False)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Metrics table: run_id, stage, metric, value, ts (obsreport
        analog; one row per counter). Stages whose action never ran are
        skipped without blocking (see ``_get_or_none``)."""
        rows = []
        now = time.time()
        for stage, obs in self.observations.items():
            got = self._get_or_none(obs)
            if got is None:
                continue
            for metric, value in got.items():
                if value is not None:
                    rows.append((self.run_id, stage, metric, float(value), now))
        for stage, metric, value in self.static:
            rows.append((self.run_id, stage, metric, value, now))
        return spark.createDataFrame(
            rows, "run_id string, stage string, metric string, value double, ts double"
        )
