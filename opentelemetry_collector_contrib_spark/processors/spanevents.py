"""OTTL span-event context: transform/filter statements over the events
nested inside each span.

Reference: ``pkg/ottl/contexts/ottlspanevent/span_events.go`` —
``parsePath`` (span_events.go:150-183) exposes per-event ``time`` /
``time_unix_nano`` / ``name`` / ``attributes[...]`` /
``dropped_attributes_count``, a ``span.*`` namespace delegating to the
enclosing span (internal/span.go SpanPathGetSetter: name, kind,
trace_id, span_id, status...), plus ``resource.*`` /
``instrumentation_scope.*`` / ``cache``.

Spark restatement: the reference iterates events inside each span with
per-event getter/setters; a columnar engine explodes the ``events``
array to rows once (``posexplode_outer`` so event-less spans survive),
runs the SAME compiled Column statements the log-context transform uses
(the context is a FRAME CONVENTION — event fields are top-level
columns, the enclosing span is a ``span`` struct column, the original
span row rides along in a stashed struct), then ONE groupBy on the span
key rebuilds the events array in order and re-emits the span row.
Explode → project → grouped rebuild is a single shuffle with NO join
and ONE scan of the spans frame — the 100 TB plan (the naive
regroup-and-join-back alternative costs a second scan plus a join that
is only broadcast-able at toy scale). Filters mark events with a drop
flag instead of deleting rows, so a span whose every event matched
still survives with an empty array.

The span struct maps the repo's flat span frame columns onto the
reference's span path names (span_name -> span.name, span_kind ->
span.kind, trace/span ids, attributes, status_code -> span.status.code
per internal/span.go:95-110).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.ottl import compile_condition, compile_statement

# flat span-frame column -> span.<path> field name
SPAN_FIELD_MAP = [
    ("span_name", "name"),
    ("span_kind", "kind"),
    ("trace_id", "trace_id"),
    ("span_id", "span_id"),
    ("parent_span_id", "parent_span_id"),
    ("attributes", "attributes"),
    ("service_name", "service_name"),
]


def _span_struct(df: DataFrame) -> Column:
    fields = [
        F.col(src).alias(dst) for src, dst in SPAN_FIELD_MAP if src in df.columns
    ]
    if "status_code" in df.columns:
        # internal/span.go accessStatus: span.status.code
        fields.append(
            F.struct(F.col("status_code").alias("code")).alias("status")
        )
    return F.struct(*fields)


def spanevent_frame(
    spans: DataFrame, events_col: str = "events"
):
    """Explode spans to one row per span event in the spanevent context
    shape: ``name``/``ts``/``attributes``(/``dropped_attributes_count``)
    from the event as TOP-LEVEL columns, ``span`` struct + passthrough
    ``resource``/``scope`` from the enclosing span. ``__span_row__``
    stashes the original span columns for the rebuild; ``__pos__``
    carries event order (null marks an event-less span's placeholder
    row). Returns ``(frame, event_field_names)``."""
    span_cols = [c for c in spans.columns if c != events_col]
    ev_fields = [
        f.name for f in spans.schema[events_col].dataType.elementType.fields
    ]
    # grouping key: the natural (trace_id, span_id) pair when present
    # (maps aren't groupable, so the stashed span row itself can't key
    # the rebuild); otherwise a monotonic id — only safe over a
    # deterministic scan
    if "trace_id" in spans.columns and "span_id" in spans.columns:
        # null-SAFE key: concat_ws silently skips null args, so
        # ('x', null) and (null, 'x') would both key as 'x' and the
        # regroup would fuse two distinct spans; coalesce each part to
        # a sentinel that cannot appear in hex ids
        sid = F.concat_ws(
            "\x1f",
            F.coalesce(F.col("trace_id").cast("string"), F.lit("\x00")),
            F.coalesce(F.col("span_id").cast("string"), F.lit("\x00")),
        )
        # two spans BOTH missing BOTH ids are distinct spans, not one:
        # give each its own key (same deterministic-scan caveat as below)
        sid = F.when(
            F.col("trace_id").isNull() & F.col("span_id").isNull(),
            F.concat(F.lit("\x00m\x1f"), F.monotonically_increasing_id()),
        ).otherwise(sid)
    else:
        sid = F.monotonically_increasing_id()
    exploded = spans.select(
        sid.alias("__sid__"),
        F.struct(*[F.col(c) for c in span_cols]).alias("__span_row__"),
        _span_struct(spans).alias("span"),
        *[F.col(c) for c in ("resource", "scope") if c in spans.columns],
        F.posexplode_outer(events_col).alias("__pos__", "__event__"),
    )
    return exploded.select(
        "__sid__",
        "__span_row__",
        "__pos__",
        "span",
        *[c for c in ("resource", "scope") if c in exploded.columns],
        *[F.col(f"__event__.{f}").alias(f) for f in ev_fields],
    ), ev_fields


def regroup_events(
    frame: DataFrame,
    spans: DataFrame,
    ev_fields: list[str],
    events_col: str = "events",
    drop_col: Column | None = None,
) -> DataFrame:
    """Rebuild each span row + its events array (original order) from
    the exploded frame in ONE grouped aggregation — no join back, no
    second scan. Placeholder rows (null ``__pos__``) and rows flagged by
    ``drop_col`` contribute no event; their span still emits (with an
    empty array when nothing survives)."""
    span_cols = [c for c in spans.columns if c != events_col]
    # resource/scope ride the exploded frame as LIVE top-level columns
    # (the spanevent context's resource.* / instrumentation_scope paths
    # write to them); rebuilding those from the pre-statement stash
    # would silently discard the writes, so they aggregate from the
    # live columns instead (one shared value per span — writes from
    # different event rows of one span are last-writer-wins in the
    # reference; first() here, as every surviving row carries the same
    # projected expression)
    live_cols = [c for c in ("resource", "scope") if c in frame.columns]
    keep = F.col("__pos__").isNotNull()
    if drop_col is not None:
        keep = keep & ~F.coalesce(drop_col, F.lit(False))
    rebuilt = (
        frame.select(
            "__sid__",
            "__span_row__",
            *live_cols,
            F.when(
                keep,
                F.struct(
                    F.col("__pos__"),
                    F.struct(
                        *[F.col(f).alias(f) for f in ev_fields]
                    ).alias("e"),
                ),
            ).alias("__pe__"),
        )
        .groupBy("__sid__")
        .agg(
            # every row in a group shares the identical stashed span row
            F.first("__span_row__").alias("__span_row__"),
            *[F.first(c).alias(f"__live_{c}__") for c in live_cols],
            F.transform(
                # explicit comparator: default struct ordering can't
                # compare map-typed event attributes; __pos__ alone
                # restores event order. collect_list drops the null
                # placeholders/flagged events for free.
                F.array_sort(
                    F.collect_list("__pe__"),
                    lambda l, r: (
                        l.getField("__pos__") - r.getField("__pos__")
                    ).cast("int"),
                ),
                lambda pe: pe.getField("e"),
            ).alias(events_col),
        )
    )
    live = {c: f"__live_{c}__" for c in live_cols}
    return rebuilt.select(
        *[
            F.col(live[c]).alias(c)
            if c in live
            else F.col(f"__span_row__.{c}").alias(c)
            for c in span_cols
        ],
        events_col,
    )


@dataclass
class SpanEventTransform:
    """transformprocessor with ``context: spanevent`` — ordered OTTL
    statements over each span event, events rebuilt in place."""

    statements: list[str]
    error_mode: str = "propagate"
    events_col: str = "events"

    def __call__(self, spans: DataFrame) -> DataFrame:
        frame, ev_fields = spanevent_frame(spans, self.events_col)
        for stmt in self.statements:
            frame = compile_statement(stmt, error_mode=self.error_mode)(frame)
        return regroup_events(frame, spans, ev_fields, self.events_col)


@dataclass
class SpanEventFilter:
    """filterprocessor ``traces.spanevent`` conditions: an event matching
    ANY condition is DROPPED from its span's events array (the span row
    itself survives — filterprocessor drops the matched signal, here the
    event; processor/filterprocessor/traces.go spanevent branch)."""

    conditions: list[str] = field(default_factory=list)
    events_col: str = "events"

    def __call__(self, spans: DataFrame) -> DataFrame:
        frame, ev_fields = spanevent_frame(spans, self.events_col)
        drop = None
        for cond in self.conditions:
            c = compile_condition(cond)
            drop = c if drop is None else (drop | c)
        return regroup_events(
            frame, spans, ev_fields, self.events_col, drop_col=drop
        )
