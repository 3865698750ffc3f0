"""Declarative pipeline config -> compiled DataFrame DAG.

Mirror of the collector's YAML topology (receivers -> processors ->
connectors/pipelines -> exporters) compiled the way the collector builds
its operator DAG (pkg/stanza/pipeline/directed.go:26-60: registered
names -> directed acyclic pipeline), but into Column-expression stages
Catalyst can fuse, instead of per-record visitors.

Example
-------
    cfg = PipelineConfig(stages=[
        StageConfig("regex_parser", {"pattern": ..., "parse_from": "text"}),
        StageConfig("lookup", {"dim": "tool_catalog", "keys": ["tool"]}),
        StageConfig("router", {"routes": [...], "default": "sink_default"}),
    ])
    df_out = compile_pipeline(cfg, dims={"tool_catalog": dim_df})(df_in)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..connectors import (
    CountConnector,
    ExcDimension,
    ExceptionsConnector,
    MetricDef,
    Route,
    RoutingConnector,
    ServiceGraphConnector,
    SpanMetricsConnector,
)
from ..operators import (
    Add,
    AssignKeys,
    ContainerParser,
    Copy,
    CsvParser,
    Filter,
    Flatten,
    JsonArrayParser,
    JsonParser,
    KeyValueParser,
    Move,
    Noop,
    Recombine,
    RegexParser,
    Remove,
    Retain,
    Router,
    ScopeNameParser,
    SeverityParser,
    SyslogParser,
    TimeParser,
    TraceParser,
    Unquote,
    UriParser,
)
from ..processors import (
    Action,
    AttributesProcessor,
    CumulativeToDelta,
    DeltaToCumulative,
    DeltaToRate,
    FilterMetricsProcessor,
    FilterProcessor,
    FilterSpansProcessor,
    GroupByAttrs,
    GenerationRule,
    IntervalProcessor,
    LookupEnrich,
    MetricOp,
    MetricTransform,
    MetricsGeneration,
    MetricsTransform,
    ProbabilisticSampler,
    Redaction,
    ResourceDetection,
    TailPolicy,
    TailSampling,
    TransformProcessor,
)
from ..processors import (
    MetricMatchProperties,
    SpanMatchProperties,
)
from ..processors import GroupByTrace as _GroupByTrace
from ..processors import transform_metrics as _tm
from ..processors.expo import DeltaToCumulativeExpo
from ..processors.k8sattributes import (
    AssociationRule as _K8sRule,
    AssociationSource as _K8sSource,
    K8sAttributes as _K8s,
)
from ..processors.metrics_state import CumulativeToDeltaHistogram
from ..processors.schema import SchemaProcessor as _Schema
from ..processors.span import SpanProcessor as _Span
from ..processors.sumologic import (
    AggregationPair as _SumoAggPair,
    NestingConfig as _SumoNesting,
    SumoLogicProcessor as _Sumo,
)

OPERATOR_REGISTRY: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {
    # stanza operators (registered-by-name parity: pkg/stanza/operator/registry.go)
    "regex_parser": RegexParser,
    "json_parser": JsonParser,
    "csv_parser": CsvParser,
    "key_value_parser": KeyValueParser,
    "time_parser": TimeParser,
    "severity_parser": SeverityParser,
    "uri_parser": UriParser,
    "syslog_parser": SyslogParser,
    "container": ContainerParser,
    "json_array_parser": JsonArrayParser,
    "trace_parser": TraceParser,
    "scope_name_parser": ScopeNameParser,
    "add": Add,
    "remove": Remove,
    "copy": Copy,
    "move": Move,
    "retain": Retain,
    "flatten": Flatten,
    "assign_keys": AssignKeys,
    "unquote": Unquote,
    "noop": Noop,
    "filter": Filter,
    "router": Router,
    "recombine": Recombine,
    # processors
    "attributes": lambda actions, **kw: AttributesProcessor(
        [Action(**a) for a in actions], **kw
    ),
    "filter_processor": FilterProcessor,
    "transform": TransformProcessor,
    "groupbyattrs": GroupByAttrs,
    "redaction": Redaction,
    "resourcedetection": ResourceDetection,
    "probabilistic_sampler": ProbabilisticSampler,
    "interval": IntervalProcessor,
    "deltatocumulative": DeltaToCumulative,
    "cumulativetodelta": CumulativeToDelta,
    "cumulativetodelta_histogram": CumulativeToDeltaHistogram,
    "deltatocumulative_expo": DeltaToCumulativeExpo,
    "deltatorate": DeltaToRate,
    # transform processor metric-context editors (function-style)
    "convert_sum_to_gauge": lambda **kw: (
        lambda df: _tm.convert_sum_to_gauge(df, **kw)
    ),
    "convert_gauge_to_sum": lambda temporality, monotonic, **kw: (
        lambda df: _tm.convert_gauge_to_sum(df, temporality, monotonic, **kw)
    ),
    "extract_count_metric": lambda monotonic=False, **kw: (
        lambda df: _tm.extract_count_metric(df, monotonic, **kw)
    ),
    "extract_sum_metric": lambda monotonic=False, **kw: (
        lambda df: _tm.extract_sum_metric(df, monotonic, **kw)
    ),
    "copy_metric": lambda **kw: (lambda df: _tm.copy_metric(df, **kw)),
    "metricstransform": lambda transforms, **kw: MetricsTransform(
        [
            MetricTransform(
                **{
                    **t,
                    "operations": [MetricOp(**o) for o in t.get("operations", [])],
                }
            )
            for t in transforms
        ],
        **kw,
    ),
    "metricsgeneration": lambda rules, **kw: MetricsGeneration(
        [GenerationRule(**r) for r in rules], **kw
    ),
    "tail_sampling": lambda policies, **kw: TailSampling(
        [_tail_policy(p) for p in policies], **kw
    ),
    "groupbytrace": _GroupByTrace,
    # filter processor's metric / trace signals (config.go Metrics /
    # Spans blocks): include/exclude dicts become match-properties
    "filter_metrics": lambda include=None, exclude=None, **kw: (
        FilterMetricsProcessor(
            include=MetricMatchProperties(**include) if include else None,
            exclude=MetricMatchProperties(**exclude) if exclude else None,
            **kw,
        )
    ),
    "filter_spans": lambda include=None, exclude=None, **kw: (
        FilterSpansProcessor(
            include=SpanMatchProperties(**include) if include else None,
            exclude=SpanMatchProperties(**exclude) if exclude else None,
            **kw,
        )
    ),
    # connectors
    "count": lambda metrics: CountConnector([MetricDef(**m) for m in metrics]),
    "routing": lambda routes, **kw: RoutingConnector(
        [Route(**r) for r in routes], **kw
    ),
    "spanmetrics": SpanMetricsConnector,
    "servicegraph": ServiceGraphConnector,
    # exceptions connector compiles to ONE of its two signals per stage
    # (the collector wires it into a metrics OR a logs pipeline the same
    # way, exceptionsconnector factory.go)
    "exceptions": lambda **kw: _build_exceptions(**kw),
    # span processor (from/to_attributes, set_status)
    "span": lambda **kw: _Span(**kw),
    # schema processor (version walk over the OTel schema-file shape)
    "schema": lambda **kw: _Schema(**kw),
    # sumologic (nest/translate/aggregate); nested option dicts compile
    # to their config dataclasses like the collector's mapstructure
    "sumologic": lambda nest_attributes=None, aggregate_attributes=None, **kw: (
        _Sumo(
            nest_attributes=(
                _SumoNesting(**nest_attributes) if nest_attributes else None
            ),
            aggregate_attributes=[
                _SumoAggPair(**a) for a in (aggregate_attributes or [])
            ],
            **kw,
        )
    ),
}


def _tail_policy(p: dict) -> TailPolicy:
    """TailPolicy from config, recursing into and/composite sub_policies."""
    p = dict(p)
    if "sub_policies" in p:
        p["sub_policies"] = [_tail_policy(sp) for sp in p["sub_policies"]]
    return TailPolicy(**p)


def _build_exceptions(
    signal: str = "metrics", dimensions: list[dict] | None = None, **kw
) -> Callable[[DataFrame], DataFrame]:
    if dimensions is not None:
        kw["dimensions"] = [ExcDimension(**d) for d in dimensions]
    c = ExceptionsConnector(**kw)
    if signal not in ("metrics", "logs"):
        raise ValueError(f"exceptions signal must be metrics|logs, got {signal!r}")
    return c.metrics if signal == "metrics" else c.logs


@dataclass
class StageConfig:
    kind: str
    options: dict[str, Any] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    stages: list[StageConfig]


def config_from_dict(doc: dict) -> PipelineConfig:
    """Collector-YAML-shaped dict -> PipelineConfig.

    The reference's config is YAML (`receivers/processors/.../operators`
    lists of `{type: ..., <options>}` maps, pkg/stanza/operator/config.go
    unmarshal-by-registered-type); the same topology expressed as JSON/
    dict compiles here: ``{"stages": [{"kind": ..., "options": {...}}]}``
    or the stanza style ``{"operators": [{"type": ..., <flat opts>}]}``.
    """
    if "stages" in doc:
        stages = [
            StageConfig(s["kind"], dict(s.get("options", {})))
            for s in doc["stages"]
        ]
    elif "operators" in doc:
        # stanza configs carry id/output (DAG wiring) and `if` (guard)
        # on every operator (pkg/stanza/operator/config.go). A compiled
        # chain is linear: ids are honored as labels only, `output`
        # must point at the NEXT operator (or be absent = implicit
        # next), and `if` maps to the operators' if_expr field.
        ops_list = list(doc["operators"])
        ids = [op.get("id", op["type"]) for op in ops_list]
        stages = []
        for i, op in enumerate(ops_list):
            opts = {}
            for k, v in op.items():
                if k in ("type", "id"):
                    continue
                if k == "output":
                    nxt = ids[i + 1] if i + 1 < len(ops_list) else None
                    if v != nxt:
                        raise ValueError(
                            f"operator {ids[i]!r}: non-linear output "
                            f"{v!r} (next stage is {nxt!r}) — the "
                            "compiled chain is linear; use a Router "
                            "stage for branching"
                        )
                    continue
                opts["if_expr" if k == "if" else k] = v
            stages.append(StageConfig(op["type"], opts))
    else:
        raise ValueError("config needs a 'stages' or 'operators' list")
    return PipelineConfig(stages=stages)


def load_pipeline_json(
    path: str, dims: dict[str, DataFrame] | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Compile a pipeline from a JSON config file (the YAML topology,
    serialized as JSON — no YAML parser in this environment)."""
    import json

    with open(path) as f:
        return compile_pipeline(config_from_dict(json.load(f)), dims)


def compile_pipeline(
    cfg: PipelineConfig, dims: dict[str, DataFrame] | None = None
) -> Callable[[DataFrame], DataFrame]:
    """Build the stage chain once (driver-side compile, SURVEY.md 3.2);
    returns a composed DataFrame -> DataFrame."""
    dims = dims or {}

    def _dim(name, kind):
        """Resolve a dim-table reference with a loud, actionable error
        (a bare KeyError from an empty dims made the lookup/geoip/
        k8sattributes stages unusable from run_pipeline --config)."""
        if not isinstance(name, str):
            return name  # already a DataFrame
        if name not in dims:
            raise ValueError(
                f"pipeline stage '{kind}' references dim table {name!r} "
                f"but no such table was supplied (available: "
                f"{sorted(dims) or 'none'}); pass dims={{...}} to "
                "compile_pipeline/load_pipeline_json, or --dim "
                "name=path.parquet to scripts/run_pipeline.py"
            )
        return dims[name]

    ops = []
    for st in cfg.stages:
        if st.kind == "lookup":
            opts = dict(st.options)
            dim = opts.pop("dim")
            ops.append(LookupEnrich(_dim(dim, "lookup"), **opts))
            continue
        if st.kind == "geoip":
            from ..processors import GeoIpEnrich

            opts = dict(st.options)
            dim = opts.pop("dim")
            ops.append(GeoIpEnrich(_dim(dim, "geoip"), **opts))
            continue
        if st.kind == "k8sattributes":
            # pods/namespaces/nodes are dim tables (the collector's
            # watch-informer state), resolved from `dims` by name
            opts = dict(st.options)
            pods = opts.pop("pods")
            assoc = [
                _K8sRule(
                    sources=[_K8sSource(**src) for src in r["sources"]],
                    dim_keys=r["dim_keys"],
                )
                for r in opts.pop("associations")
            ]
            for extra in ("namespaces", "nodes"):
                if isinstance(opts.get(extra), str):
                    opts[extra] = _dim(opts[extra], "k8sattributes")
            ops.append(
                _K8s(
                    _dim(pods, "k8sattributes"),
                    assoc,
                    **opts,
                )
            )
            continue
        if st.kind not in OPERATOR_REGISTRY:
            raise KeyError(f"unknown stage kind {st.kind!r}")
        ops.append(OPERATOR_REGISTRY[st.kind](**st.options))

    def run(df: DataFrame) -> DataFrame:
        for op in ops:
            df = op(df)
        return df

    return run
