"""Sumo Logic processor: attribute shaping sub-processors.

Reference: processor/sumologicprocessor (processor.go:33-59 fixes the
sub-processor order: cloud_namespace -> translate_attributes ->
nest_attributes -> aggregate_attributes -> log-fields conversion):

- cloud_namespace_processor.go:57-71: resources whose ``cloud.platform``
  is aws_ec2 / aws_ecs / aws_elastic_beanstalk gain ``cloud.namespace``
  = "aws/ec2" / "ecs" / "ElasticBeanstalk".
- translate_attributes_processor.go:19-41 + translateAttributes: a fixed
  OT->Sumo key rename table; a key is NOT renamed when the target key
  already exists in the original map, and when two keys map to the same
  target the FIRST in map order wins.
- nesting_processor.go:119-199: dotted keys expand into nested maps
  (allowlist/denylist prefixes, leaf-vs-map collisions put the former
  value under ``""``), optional squash_single_values re-joins
  single-entry chains ("a"->"b"->{...} becomes "a.b").
- aggregate_attributes_processor.go:73-127 + getNewKey:166-172: keys
  matching any configured prefix are removed and re-keyed (prefix
  stripped) under one new map-valued attribute, in prefix-then-map
  order.
- log_fields_conversion_processor.go:92-112: severity number/text and
  span/trace ids become attributes unless the canonical attribute
  (loglevel / severitytext / spanid / traceid) is already present.

Columnar restatement: attributes are ``map<string,string>`` where a
map-valued attribute is its compact JSON object encoding. The cloud
namespace, translation, and log-fields steps are pure Column
expressions (zero shuffle, whole-stage codegen). Nesting and
aggregation build a per-record tree — no fixed-depth Column expression
exists — so they run in ONE Arrow-batched pandas UDF over the map
column (the documented slow path; O(keys) per record, no shuffle).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..envelope import try_element_at
from pyspark.sql.functions import pandas_udf

# translate_attributes_processor.go:19-41
ATTRIBUTE_TRANSLATIONS = {
    "cloud.account.id": "AccountId",
    "cloud.availability_zone": "AvailabilityZone",
    "cloud.platform": "aws_service",
    "cloud.region": "Region",
    "host.id": "InstanceId",
    "host.name": "host",
    "host.type": "InstanceType",
    "k8s.cluster.name": "Cluster",
    "k8s.container.name": "container",
    "k8s.daemonset.name": "daemonset",
    "k8s.deployment.name": "deployment",
    "k8s.namespace.name": "namespace",
    "k8s.node.name": "node",
    "k8s.service.name": "service",
    "k8s.pod.hostname": "host",
    "k8s.pod.name": "pod",
    "k8s.pod.uid": "pod_id",
    "k8s.replicaset.name": "replicaset",
    "k8s.statefulset.name": "statefulset",
    "service.name": "service",
    "log.file.path_resolved": "_sourceName",
}

# cloud_namespace_processor.go:17-22 + addCloudNamespaceAttribute
CLOUD_NAMESPACES = {
    "aws_ec2": "aws/ec2",
    "aws_ecs": "ecs",
    "aws_elastic_beanstalk": "ElasticBeanstalk",
}

# translate_telegraf_metrics_processor.go:19-66 metricsTranslations
TELEGRAF_METRIC_TRANSLATIONS = {
    "cpu_usage_active": "CPU_Total",
    "cpu_usage_idle": "CPU_Idle",
    "cpu_usage_iowait": "CPU_IOWait",
    "cpu_usage_irq": "CPU_Irq",
    "cpu_usage_nice": "CPU_Nice",
    "cpu_usage_softirq": "CPU_SoftIrq",
    "cpu_usage_steal": "CPU_Stolen",
    "cpu_usage_System": "CPU_Sys",
    "cpu_usage_user": "CPU_User",
    "system_load1": "CPU_LoadAvg_1min",
    "system_load5": "CPU_LoadAvg_5min",
    "system_load15": "CPU_LoadAvg_15min",
    "disk_used": "Disk_Used",
    "disk_used_percent": "Disk_UsedPercent",
    "disk_inodes_free": "Disk_InodesAvailable",
    "diskio_reads": "Disk_Reads",
    "diskio_read_bytes": "Disk_ReadBytes",
    "diskio_writes": "Disk_Writes",
    "diskio_write_bytes": "Disk_WriteBytes",
    "mem_total": "Mem_Total",
    "mem_free": "Mem_free",
    "mem_available": "Mem_ActualFree",
    "mem_used": "Mem_ActualUsed",
    "mem_used_percent": "Mem_UsedPercent",
    "mem_available_percent": "Mem_FreePercent",
    "procstat_num_threads": "Proc_Threads",
    "procstat_memory_vms": "Proc_VMSize",
    "procstat_memory_rss": "Proc_RSSize",
    "procstat_cpu_usage": "Proc_CPU",
    "procstat_major_faults": "Proc_MajorFaults",
    "procstat_minor_faults": "Proc_MinorFaults",
    "net_bytes_sent": "Net_OutBytes",
    "net_bytes_recv": "Net_InBytes",
    "net_packets_sent": "Net_OutPackets",
    "net_packets_recv": "Net_InPackets",
    "netstat_tcp_close": "TCP_Close",
    "netstat_tcp_close_wait": "TCP_CloseWait",
    "netstat_tcp_closing": "TCP_Closing",
    "netstat_tcp_established": "TCP_Established",
    "netstat_tcp_listen": "TCP_Listen",
    "netstat_tcp_time_wait": "TCP_TimeWait",
}

# translate_docker_metrics_processor.go dockerMetricsTranslations
DOCKER_METRIC_TRANSLATIONS = {
    "container.cpu.percent": "cpu_percentage",
    "container.cpu.usage.system": "system_cpu_usage",
    "container.cpu.usage.percpu": "cpu_usage.percpu_usage",
    "container.cpu.usage.total": "cpu_usage.total_usage",
    "container.cpu.usage.kernelmode": "cpu_usage.usage_in_kernelmode",
    "container.cpu.usage.usermode": "cpu_usage.usage_in_usermode",
    "container.cpu.throttling_data.periods": "throttling_data.periods",
    "container.cpu.throttling_data.throttled_periods": "throttling_data.throttled_periods",
    "container.cpu.throttling_data.throttled_time": "throttling_data.throttled_time",
    "container.memory.usage.limit": "limit",
    "container.memory.usage.max": "max_usage",
    "container.memory.percent": "memory_percentage",
    "container.memory.usage.total": "usage",
    "container.memory.active_anon": "stats.active_anon",
    "container.memory.active_file": "stats.active_file",
    "container.memory.cache": "stats.cache",
    "container.memory.hierarchical_memory_limit": "stats.hierarchical_memory_limit",
    "container.memory.inactive_anon": "stats.inactive_anon",
    "container.memory.inactive_file": "stats.inactive_file",
    "container.memory.mapped_file": "stats.mapped_file",
    "container.memory.pgfault": "stats.pgfault",
    "container.memory.pgmajfault": "stats.pgmajfault",
    "container.memory.pgpgin": "stats.pgpgin",
    "container.memory.pgpgout": "stats.pgpgout",
    "container.memory.rss": "stats.rss",
    "container.memory.rss_huge": "stats.rss_huge",
    "container.memory.unevictable": "stats.unevictable",
    "container.memory.writeback": "stats.writeback",
    "container.memory.total_active_anon": "stats.total_active_anon",
    "container.memory.total_active_file": "stats.total_active_file",
    "container.memory.total_cache": "stats.total_cache",
    "container.memory.total_inactive_anon": "stats.total_inactive_anon",
    "container.memory.total_mapped_file": "stats.total_mapped_file",
    "container.memory.total_pgfault": "stats.total_pgfault",
    "container.memory.total_pgmajfault": "stats.total_pgmajfault",
    "container.memory.total_pgpgin": "stats.total_pgpgin",
    "container.memory.total_pgpgout": "stats.total_pgpgout",
    "container.memory.total_rss": "stats.total_rss",
    "container.memory.total_rss_huge": "stats.total_rss_huge",
    "container.memory.total_unevictable": "stats.total_unevictable",
    "container.memory.total_writeback": "stats.total_writeback",
    "container.blockio.io_merged_recursive": "io_merged_recursive",
    "container.blockio.io_queued_recursive": "io_queue_recursive",
    "container.blockio.io_service_bytes_recursive": "io_service_bytes_recursive",
    "container.blockio.io_service_time_recursive": "io_service_time_recursive",
    "container.blockio.io_serviced_recursive": "io_serviced_recursive",
    "container.blockio.io_time_recursive": "io_time_recursive",
    "container.blockio.io_wait_time_recursive": "io_wait_time_recursive",
    "container.blockio.sectors_recursive": "sectors_recursive",
}

# translate_docker_metrics_processor.go dockerReasourceAttributeTranslations
DOCKER_RESOURCE_ATTRIBUTE_TRANSLATIONS = {
    "container.id": "container.FullID",
    "container.image.name": "container.ImageName",
    "container.name": "container.Name",
}

# log_fields_conversion_processor.go:14-19 — the presence check uses
# these CANONICAL names even when the configured output name differs
CANONICAL_LOG_FIELDS = {
    "severity_number": "loglevel",
    "severity_text": "severitytext",
    "span_id": "spanid",
    "trace_id": "traceid",
}

_SEV_BASE = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]


def severity_number_to_level(n: int) -> str | None:
    """plog severity number (1-24) -> Sumo level string
    (log_fields_conversion_processor.go:51-77)."""
    if not 1 <= n <= 24:
        return None
    base, off = _SEV_BASE[(n - 1) // 4], (n - 1) % 4
    return base if off == 0 else f"{base}{off + 1}"


@dataclass
class NestingConfig:
    enabled: bool = False
    separator: str = "."
    include: list[str] = field(default_factory=list)
    exclude: list[str] = field(default_factory=list)
    squash_single_values: bool = False


@dataclass
class AggregationPair:
    attribute: str
    prefixes: list[str]


# --- python tree ops shared by the pandas UDF (and unit-testable) -----------


def _decode(v: str):
    """Flat-model decode: a JSON-object string is a map value."""
    if isinstance(v, str) and v.startswith("{"):
        try:
            d = json.loads(v)
            if isinstance(d, dict):
                return {k: _decode(x) if isinstance(x, str) else x for k, x in d.items()}
        except ValueError:
            pass
    return v


def _encode(v) -> str:
    if isinstance(v, dict):
        return json.dumps(
            {k: json.loads(_encode(x)) if isinstance(x, dict) else x for k, x in v.items()},
            separators=(",", ":"),
        )
    return v


def translate_attrs(attrs: dict) -> dict:
    """Python twin of the staged translate (translateAttributes,
    translate_attributes_processor.go:63-90): rename unless the target
    key already exists in the ORIGINAL map; first occurrence wins."""
    result: dict = {}
    for k, v in attrs.items():
        sumo = ATTRIBUTE_TRANSLATIONS.get(k)
        key = sumo if sumo is not None and sumo not in attrs else k
        if key not in result:
            result[key] = v
    return result


def _should_nest_key(k: str, include: list[str], exclude: list[str]) -> bool:
    """nesting_processor.go:199-223 shouldTranslateKey."""
    if include and not any(k.startswith(p) for p in include):
        return False
    return not any(k.startswith(p) for p in exclude)


def nest_attrs(attrs: dict, cfg: NestingConfig) -> dict:
    """nesting_processor.go:119-173 processAttributes."""
    new: dict = {}
    for k, v in attrs.items():
        if not _should_nest_key(k, cfg.include, cfg.exclude):
            new[k] = v
            continue
        keys = k.split(cfg.separator)
        node = new
        for i, part in enumerate(keys):
            missing = part not in node
            existing = node.get(part)
            last = i == len(keys) - 1
            if last:
                if isinstance(existing, dict):
                    if isinstance(v, dict):
                        existing.update(v)  # merge maps
                    else:
                        existing[""] = v  # former-map rule, inverted
                else:
                    node[part] = v
            else:
                if missing:
                    node[part] = {}
                elif not isinstance(existing, dict):
                    # leaf displaced under "" (nesting_processor.go:143-149)
                    node[part] = {"": existing}
                node = node[part]
    if cfg.squash_single_values:
        suf, sv = _squash_value(new, cfg.separator)
        new = {suf: sv} if suf is not None else sv
    return new


def _squash_value(v, sep: str):
    """nesting_processor.go:225-289 squash/squashAttribute: returns
    (joined key suffix or None, squashed value)."""
    if not isinstance(v, dict):
        return None, v
    if len(v) == 1:
        (k, inner), = v.items()
        suf, sv = _squash_value(inner, sep)
        return (k if suf is None else k + sep + suf), sv
    out = {}
    for k, inner in v.items():
        suf, sv = _squash_value(inner, sep)
        out[k if suf is None else k + sep + suf] = sv
    return None, out


def aggregate_attrs(attrs: dict, pairs: list[AggregationPair]) -> dict:
    """aggregate_attributes_processor.go:73-127."""
    out = dict(attrs)
    for pair in pairs:
        collected: dict = {}
        for prefix in pair.prefixes:
            remaining: dict = {}
            for k, v in out.items():
                if k.startswith(prefix):
                    collected[k[len(prefix):]] = v  # last-wins like PutEmpty
                else:
                    remaining[k] = v
            out = remaining
        if collected:
            out[pair.attribute] = collected
    return out


@dataclass
class SumoLogicProcessor:
    add_cloud_namespace: bool = True
    translate_attributes: bool = True
    # config.go TranslateTelegrafAttributes / TranslateDockerMetrics:
    # metric NAME rename tables (translate_telegraf_metrics_processor.go
    # translateTelegrafMetric, translate_docker_metrics_processor.go
    # translateDockerMetric + resource-attr table with the same
    # translateAttributes no-overwrite semantics)
    translate_telegraf_metrics: bool = False
    translate_docker_metrics: bool = False
    nest_attributes: NestingConfig | None = None
    aggregate_attributes: list[AggregationPair] = field(default_factory=list)
    # enabled log fields: config key -> output attribute name
    log_fields: dict[str, str] = field(default_factory=dict)
    attrs_col: str = "attributes"
    metric_name_col: str = "metric_name"
    severity_number_col: str = "severity_number"
    severity_text_col: str = "severity_text"
    span_id_col: str = "span_id"
    trace_id_col: str = "trace_id"

    def __post_init__(self):
        bad = set(self.log_fields) - set(CANONICAL_LOG_FIELDS)
        if bad:
            raise ValueError(f"unknown log fields: {sorted(bad)}")

    # --- columnar steps ------------------------------------------------------

    def _with_cloud_namespace(self, attrs: Column) -> Column:
        platform = try_element_at(attrs, "cloud.platform")
        ns = reduce(
            lambda acc, kv: acc.when(platform == kv[0], F.lit(kv[1])),
            CLOUD_NAMESPACES.items(),
            F.when(F.lit(False), F.lit(None)),
        ).otherwise(F.lit(None))
        return F.when(
            ns.isNotNull(),
            F.map_concat(
                F.map_filter(attrs, lambda k, _: k != "cloud.namespace"),
                F.create_map(F.lit("cloud.namespace"), ns),
            ),
        ).otherwise(attrs)

    def _translate_staged(
        self, df: DataFrame, translations: dict[str, str] | None = None
    ) -> DataFrame:
        """Staged translateAttributes rename: the renamed-entry
        array is MATERIALIZED as a staged column so the first-wins filter's
        lambdas take a plain attribute input — sibling-chained
        filter-over-transform can misevaluate nondeterministically on
        classic PySpark 4.1 (all lambda variables share names x/y/z; see
        processors/expo.py collapse for the full account)."""
        table = F.create_map(
            *[
                F.lit(x)
                for kv in (translations or ATTRIBUTE_TRANSLATIONS).items()
                for x in kv
            ]
        )
        attrs = F.col(self.attrs_col)
        df = df.withColumn(
            "__sl_ren__",
            F.transform(
                F.map_entries(attrs),
                lambda e: F.struct(
                    F.when(
                        try_element_at(table, e.getField("key")).isNotNull()
                        & ~F.map_contains_key(
                            attrs, try_element_at(table, e.getField("key"))
                        ),
                        try_element_at(table, e.getField("key")),
                    )
                    .otherwise(e.getField("key"))
                    .alias("key"),
                    e.getField("value").alias("value"),
                ),
            ),
        )
        ren = F.col("__sl_ren__")
        firsts = F.filter(
            ren,
            lambda e, idx: ~F.exists(
                F.slice(ren, F.lit(1), idx),
                lambda prev: prev.getField("key") == e.getField("key"),
            ),
        )
        return df.withColumn(self.attrs_col, F.map_from_entries(firsts)).drop(
            "__sl_ren__"
        )

    def _with_log_fields(self, df: DataFrame) -> DataFrame:
        attrs = F.col(self.attrs_col)
        adds: list[tuple[str, Column, Column]] = []
        if "severity_number" in self.log_fields:
            n = F.col(self.severity_number_col)
            level = reduce(
                lambda acc, i: acc.when(n == i, F.lit(severity_number_to_level(i))),
                range(1, 25),
                F.when(F.lit(False), F.lit(None)),
            ).otherwise(F.lit(None))
            adds.append(("severity_number", (n != 0) & n.isNotNull(), level))
        if "severity_text" in self.log_fields:
            adds.append(("severity_text", F.lit(True), F.col(self.severity_text_col)))
        if "span_id" in self.log_fields:
            adds.append(("span_id", F.lit(True), F.coalesce(F.col(self.span_id_col), F.lit(""))))
        if "trace_id" in self.log_fields:
            adds.append(("trace_id", F.lit(True), F.coalesce(F.col(self.trace_id_col), F.lit(""))))
        out = df
        for fld, cond, value in adds:
            canonical = CANONICAL_LOG_FIELDS[fld]
            target = self.log_fields[fld]
            attrs = F.col(self.attrs_col)
            out = out.withColumn(
                self.attrs_col,
                F.when(
                    cond & ~F.map_contains_key(attrs, canonical) & value.isNotNull(),
                    F.map_concat(
                        F.map_filter(attrs, lambda k, _: k != F.lit(target)),
                        F.create_map(F.lit(target), value),
                    ),
                ).otherwise(attrs),
            )
        return out

    # --- driver ---------------------------------------------------------------

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df
        attrs = F.col(self.attrs_col)
        if self.add_cloud_namespace:
            out = out.withColumn(self.attrs_col, self._with_cloud_namespace(attrs))

        nest_cfg = self.nest_attributes
        pairs = self.aggregate_attributes
        udf_path = bool(nest_cfg and nest_cfg.enabled) or bool(pairs)

        # Catalyst cannot extract a pandas UDF whose (projection-collapsed)
        # input embeds the translate expression's correlated nested lambda
        # (exists-over-slice referencing the outer lambda variable) —
        # [INTERNAL_ERROR] Cannot generate code for expression. When the
        # shaping UDF runs anyway, fold translation into the same Arrow
        # pass (identical semantics, one batch transfer); columnar
        # translation remains the UDF-free fast path.
        do_translate_in_udf = self.translate_attributes and udf_path
        if self.translate_attributes and not udf_path:
            out = self._translate_staged(out)

        if udf_path:
            @pandas_udf("map<string,string>")
            def shape(col: pd.Series) -> pd.Series:
                def one(m):
                    if m is None:
                        return m
                    d = {k: _decode(v) for k, v in m.items()}
                    if do_translate_in_udf:
                        d = translate_attrs(d)
                    if nest_cfg and nest_cfg.enabled:
                        d = nest_attrs(d, nest_cfg)
                    if pairs:
                        d = aggregate_attrs(d, pairs)
                    return {k: _encode(v) for k, v in d.items()}

                return col.map(one)

            out = out.withColumn(self.attrs_col, shape(F.col(self.attrs_col)))

        if self.log_fields:
            out = self._with_log_fields(out)

        # metric-plane renames: simple name-table lookups (the docker
        # variant also translates resource attrs via the no-overwrite
        # translateAttributes rule, but with its own table)
        name_tables = []
        if self.translate_telegraf_metrics:
            name_tables.append(TELEGRAF_METRIC_TRANSLATIONS)
        if self.translate_docker_metrics:
            name_tables.append(DOCKER_METRIC_TRANSLATIONS)
        if name_tables and self.metric_name_col in out.columns:
            for tbl in name_tables:
                lookup = F.create_map(*[F.lit(x) for kv in tbl.items() for x in kv])
                out = out.withColumn(
                    self.metric_name_col,
                    F.coalesce(
                        try_element_at(lookup, F.col(self.metric_name_col)),
                        F.col(self.metric_name_col),
                    ),
                )
        if self.translate_docker_metrics and self.attrs_col in out.columns:
            out = self._translate_staged(out, DOCKER_RESOURCE_ATTRIBUTE_TRANSLATIONS)
        return out
