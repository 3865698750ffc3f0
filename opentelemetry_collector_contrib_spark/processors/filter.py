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
class LogMatchProperties:
    """Declarative include/exclude matcher — the reference's
    ``LogMatchProperties`` config surface (processor/filterprocessor/
    config.go + internal/filter/filterlog/filterlog.go:30-130).

    Property groups AND together; the values WITHIN severity_texts /
    log_bodies OR together; every listed attribute must match. strict =
    equality, regexp = unanchored regex (Go filterset MatchString =
    Spark ``rlike``). ``severity_min`` matches records at or above the
    named severity, with severity 0 (undefined) matching only when
    ``match_undefined`` (LogSeverityNumberMatchProperties)."""

    match_type: str = "strict"  # strict | regexp
    resource_attributes: list[tuple[str, str]] = field(default_factory=list)
    record_attributes: list[tuple[str, str]] = field(default_factory=list)
    severity_texts: list[str] = field(default_factory=list)
    log_bodies: list[str] = field(default_factory=list)
    severity_min: str | None = None
    match_undefined: bool = False

    def __post_init__(self):
        if self.match_type not in ("strict", "regexp"):
            raise ValueError("match_type must be 'strict' or 'regexp'")

    def _one(self, col: F.Column, value: str) -> F.Column:
        hit = col == value if self.match_type == "strict" else col.rlike(value)
        return F.coalesce(hit, F.lit(False))

    def compile(
        self,
        resource_col: str = "resource",
        attributes_col: str = "attributes",
        severity_text_col: str = "severity_text",
        severity_number_col: str = "severity_number",
        body_col: str = "body",
    ) -> F.Column | None:
        """Boolean match Column, or None when no properties are set (an
        empty include keeps everything, an empty exclude drops nothing
        — the reference treats an empty properties object as absent)."""
        groups: list[F.Column] = []
        for key, value in self.resource_attributes:
            groups.append(self._one(F.col(resource_col).getItem(key), value))
        for key, value in self.record_attributes:
            groups.append(self._one(F.col(attributes_col).getItem(key), value))
        if self.severity_texts:
            hit = F.lit(False)
            for v in self.severity_texts:
                hit = hit | self._one(F.col(severity_text_col), v)
            groups.append(hit)
        if self.log_bodies:
            hit = F.lit(False)
            for v in self.log_bodies:
                hit = hit | self._one(F.col(body_col), v)
            groups.append(hit)
        if self.severity_min is not None:
            from ..operators.parsers import SEVERITY_NUMBERS

            lo = SEVERITY_NUMBERS[self.severity_min.lower()]
            num = F.coalesce(F.col(severity_number_col), F.lit(0))
            hit = num >= lo
            if self.match_undefined:
                hit = hit | (num == 0)
            else:
                hit = hit & (num != 0)
            groups.append(hit)
        if not groups:
            return None
        cond = groups[0]
        for g in groups[1:]:
            cond = cond & g
        return cond


@dataclass
class MetricMatchProperties:
    """The reference's ``MetricMatchProperties`` (processor/
    filterprocessor/config.go MetricFilters + internal/filter/
    filtermetric): a metric matches when its name matches ANY listed
    name (strict equality or Go-regexp ``MatchString`` = unanchored
    ``rlike``) AND its resource carries EVERY listed attribute. With
    neither names nor attributes the properties object is treated as
    absent (nil matcher — the emptyFilterInclude/Exclude cases)."""

    match_type: str = "strict"  # strict | regexp
    metric_names: list[str] = field(default_factory=list)
    resource_attributes: list[tuple[str, str]] = field(default_factory=list)

    def __post_init__(self):
        if self.match_type not in ("strict", "regexp"):
            raise ValueError("match_type must be 'strict' or 'regexp'")

    def compile(
        self, name_col: str = "metric_name", resource_col: str = "resource"
    ) -> F.Column | None:
        if not self.metric_names and not self.resource_attributes:
            return None
        groups: list[F.Column] = []
        if self.metric_names:
            hit = F.lit(False)
            for v in self.metric_names:
                col = F.col(name_col)
                one = col == v if self.match_type == "strict" else col.rlike(v)
                hit = hit | F.coalesce(one, F.lit(False))
            groups.append(hit)
        for key, value in self.resource_attributes:
            col = F.col(resource_col).getItem(key)
            one = col == value if self.match_type == "strict" else col.rlike(value)
            groups.append(F.coalesce(one, F.lit(False)))
        cond = groups[0]
        for g in groups[1:]:
            cond = cond & g
        return cond


@dataclass
class FilterMetricsProcessor:
    """Metrics-signal filter (processor/filterprocessor/metrics.go):
    keep only metrics matching ``include`` and drop those matching
    ``exclude``; OTTL/SQL ``conditions`` cascade after, matching ->
    DROP, exactly like the logs signal."""

    include: MetricMatchProperties | None = None
    exclude: MetricMatchProperties | None = None
    conditions: list[str] = field(default_factory=list)
    name_col: str = "metric_name"
    resource_col: str = "resource"
    observe_name: str | None = None

    def matched(self) -> F.Column:
        cond = F.lit(False)
        for c in self.conditions:
            cond = cond | F.coalesce(F.expr(c), F.lit(False))
        if self.include is not None:
            inc = self.include.compile(self.name_col, self.resource_col)
            if inc is not None:
                cond = cond | ~inc
        if self.exclude is not None:
            exc = self.exclude.compile(self.name_col, self.resource_col)
            if exc is not None:
                cond = cond | exc
        return cond

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = self.matched()
        if self.observe_name:
            obs = Observation(self.observe_name)
            df = df.observe(
                obs,
                F.sum(cond.cast("long")).alias("filtered"),
                F.count(F.lit(1)).alias("seen"),
            )
            self.observation = obs
        return df.filter(~cond)


@dataclass
class SpanMatchProperties:
    """The reference's span ``MatchProperties`` (internal/filter/
    filterspan/filterspan.go): services match the resource's
    ``service.name`` (ANY of the listed values), span_names match the
    span name, attributes must ALL be present on the span, libraries
    match the instrumentation scope name (+optional version). Groups
    AND together; values within a list OR together."""

    match_type: str = "strict"  # strict | regexp
    services: list[str] = field(default_factory=list)
    span_names: list[str] = field(default_factory=list)
    attributes: list[tuple[str, str]] = field(default_factory=list)
    libraries: list[tuple[str, str | None]] = field(default_factory=list)

    def __post_init__(self):
        if self.match_type not in ("strict", "regexp"):
            raise ValueError("match_type must be 'strict' or 'regexp'")

    def _one(self, col: F.Column, value: str) -> F.Column:
        hit = col == value if self.match_type == "strict" else col.rlike(value)
        return F.coalesce(hit, F.lit(False))

    def compile(
        self,
        name_col: str = "span_name",
        attributes_col: str = "attributes",
        resource_col: str = "resource",
        scope_name_col: str = "scope_name",
        scope_version_col: str = "scope_version",
    ) -> F.Column | None:
        groups: list[F.Column] = []
        if self.services:
            svc = F.col(resource_col).getItem("service.name")
            hit = F.lit(False)
            for v in self.services:
                hit = hit | self._one(svc, v)
            groups.append(hit)
        if self.span_names:
            hit = F.lit(False)
            for v in self.span_names:
                hit = hit | self._one(F.col(name_col), v)
            groups.append(hit)
        for key, value in self.attributes:
            groups.append(self._one(F.col(attributes_col).getItem(key), value))
        if self.libraries:
            hit = F.lit(False)
            for lib, ver in self.libraries:
                one = self._one(F.col(scope_name_col), lib)
                if ver is not None:
                    one = one & self._one(F.col(scope_version_col), ver)
                hit = hit | one
            groups.append(hit)
        if not groups:
            return None
        cond = groups[0]
        for g in groups[1:]:
            cond = cond & g
        return cond


@dataclass
class FilterSpansProcessor:
    """Traces-signal filter (processor/filterprocessor/traces.go): keep
    only spans matching ``include``, drop those matching ``exclude``,
    then the OTTL/SQL condition cascade (matching -> DROP)."""

    include: SpanMatchProperties | None = None
    exclude: SpanMatchProperties | None = None
    conditions: list[str] = field(default_factory=list)
    observe_name: str | None = None

    def matched(self) -> F.Column:
        cond = F.lit(False)
        for c in self.conditions:
            cond = cond | F.coalesce(F.expr(c), F.lit(False))
        if self.include is not None:
            inc = self.include.compile()
            if inc is not None:
                cond = cond | ~inc
        if self.exclude is not None:
            exc = self.exclude.compile()
            if exc is not None:
                cond = cond | exc
        return cond

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = self.matched()
        if self.observe_name:
            obs = Observation(self.observe_name)
            df = df.observe(
                obs,
                F.sum(cond.cast("long")).alias("filtered"),
                F.count(F.lit(1)).alias("seen"),
            )
            self.observation = obs
        return df.filter(~cond)


@dataclass
class FilterProcessor:
    conditions: list[str] = field(default_factory=list)
    #                              OR-joined predicates; match -> DROP
    observe_name: str | None = None  # emit <name>.filtered count via observe()
    language: str = "sql"          # sql | ottl — the reference's conditions
    #                                ARE OTTL (filterprocessor config
    #                                `logs.log_record` statements); "ottl"
    #                                routes them through compile_condition
    include: LogMatchProperties | None = None  # keep ONLY matching records
    exclude: LogMatchProperties | None = None  # drop matching records

    def __post_init__(self):
        if self.language not in ("sql", "ottl"):
            raise ValueError("language must be 'sql' or 'ottl'")

    def matched(self, df: DataFrame | None = None) -> F.Column:
        """DROP condition: any OTTL/SQL condition, OR falling outside
        ``include``, OR matching ``exclude`` (filterprocessor logs.go
        applies include/exclude matchers then the condition cascade)."""
        cond = F.lit(False)
        for c in self.conditions:
            if self.language == "ottl":
                from ..functions import compile_condition

                compiled = compile_condition(c, df)
            else:
                compiled = F.expr(c)
            cond = cond | F.coalesce(compiled, F.lit(False))
        if self.include is not None:
            inc = self.include.compile()
            if inc is not None:
                cond = cond | ~inc
        if self.exclude is not None:
            exc = self.exclude.compile()
            if exc is not None:
                cond = cond | exc
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
