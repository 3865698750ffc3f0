"""Grafana Cloud host-info connector: traces -> host metrics.

Reference: connector/grafanacloudconnector —
- connector.go:20-23: metric name ``traces_host_info``, datapoint
  attribute ``grafana.host.id``.
- connector.go:66-81 (ConsumeTraces): per resource, the FIRST
  configured identifier present in the resource attributes supplies the
  host id (``break`` fires on the first present key — later identifiers
  are not fallbacks for it).
- host_metrics.go:42-71 (metrics): each flush emits one gauge datapoint
  per DISTINCT host observed since the last flush, value 1; nothing is
  emitted when no hosts were seen (count==0 -> nil).
- config.go HostIdentifiers default ["host.id"]; FlushInterval batches
  the distinct-host set per interval.

Columnar restatement: the running distinct-host set per flush interval
is exactly ``groupBy(window(ts, interval), host).agg()`` — a single
map-side-combinable distinct (partial aggregation collapses duplicate
hosts inside each task before the one shuffle), so the shuffle volume
is O(distinct hosts x intervals), not O(spans). Without a flush
interval the whole batch is one flush, mirroring a single collector
flush tick.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at

HOST_INFO_METRIC = "traces_host_info"  # connector.go:21
HOST_ID_ATTR = "grafana.host.id"       # connector.go:22


@dataclass
class GrafanaCloudConnector:
    host_identifiers: list[str] = field(default_factory=lambda: ["host.id"])
    flush_interval: str | None = None  # e.g. "10 minutes"; None = whole batch
    attrs_col: str = "attributes"
    ts_col: str = "ts"

    def __post_init__(self):
        if not self.host_identifiers:
            raise ValueError("host_identifiers must not be empty")  # config.go Validate

    def __call__(self, spans: DataFrame) -> DataFrame:
        # first PRESENT identifier wins (connector.go:72-79); a map value
        # is never null, so presence == non-null element_at
        host = F.coalesce(
            *[try_element_at(F.col(self.attrs_col), k) for k in self.host_identifiers],
            F.lit(None).cast("string"),
        )
        seen = spans.select(host.alias("host_id"), F.col(self.ts_col)).filter(
            F.col("host_id").isNotNull()
        )
        if self.flush_interval:
            keys = [F.window(F.col(self.ts_col), self.flush_interval).alias("flush")]
            grouped = seen.groupBy(*keys, F.col("host_id")).agg(
                F.lit(1).cast("long").alias("value")
            )
            return grouped.select(
                F.lit(HOST_INFO_METRIC).alias("metric_name"),
                F.col("flush.start").alias("flush_start"),
                F.col("host_id"),
                F.col("value"),
            )
        return (
            seen.select("host_id")
            .distinct()
            .select(
                F.lit(HOST_INFO_METRIC).alias("metric_name"),
                F.col("host_id"),
                F.lit(1).cast("long").alias("value"),
            )
        )

    def host_count(self, spans: DataFrame) -> DataFrame:
        """The connector's own gauge ``grafanacloud_host_count``
        (documentation.md): distinct hosts currently tracked."""
        out = self(spans)
        keys = ["flush_start"] if self.flush_interval else []
        return out.groupBy(*keys).agg(F.count("*").alias("host_count"))
