"""Operator protocol + shared stanza semantics.

A stanza operator (reference: pkg/stanza/operator/helper/transformer.go)
processes one entry and forwards it; errors honor
``on_error: send|send_quiet|drop|drop_quiet`` (transformer.go:40-48,
97-108 — *send* forwards the row unmodified, *drop* discards it) and an
optional ``if`` expression guard skips the transformation per row
(helper/parser.go:102-110).

Spark-first restatement: an operator is ``DataFrame -> DataFrame``
built from declarative Column expressions. Per-row control flow
becomes ``F.when`` (guards) and ``.filter`` (drops) — whole-stage
codegen'd, never per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Operator = Callable[[DataFrame], DataFrame]

ON_ERROR_MODES = ("send", "send_quiet", "drop", "drop_quiet")


def chain(df: DataFrame, ops: Iterable[Operator]) -> DataFrame:
    """Run an operator pipeline in order (pipeline/directed.go semantics:
    fixed user order; Catalyst may still fuse/reorder safely because each
    op is a pure projection/filter)."""
    for op in ops:
        df = op(df)
    return df


def guarded(df: DataFrame, if_expr: str | None, transform: Callable[[DataFrame], DataFrame], protected: list[str]) -> DataFrame:
    """Apply ``transform`` only to rows matching ``if_expr``; other rows
    pass through with the new columns null. ``protected`` columns that the
    transform overwrites are restored for non-matching rows."""
    if if_expr is None:
        return transform(df)
    cond = F.expr(if_expr)
    before = {c: F.col(c) for c in protected}
    marked = df.withColumn("__guard__", cond)
    out = transform(marked)
    for c in protected:
        if c in df.columns:
            out = out.withColumn(
                c, F.when(F.col("__guard__"), F.col(c)).otherwise(before[c])
            )
    new_cols = [c for c in out.columns if c not in df.columns and c != "__guard__"]
    for c in new_cols:
        out = out.withColumn(c, F.when(F.col("__guard__"), F.col(c)))
    return out.drop("__guard__")


def apply_on_error(
    df: DataFrame,
    ok: Column,
    on_error: str,
    if_expr: str | None = None,
) -> DataFrame:
    """Post-parse error handling. ``ok`` is the per-row parse-success
    predicate; rows where it is false are dropped under ``drop*`` modes
    (unless the ``if`` guard excluded them from parsing at all)."""
    if on_error not in ON_ERROR_MODES:
        raise ValueError(f"on_error must be one of {ON_ERROR_MODES}")
    if on_error.startswith("drop"):
        keep = ok
        if if_expr is not None:
            keep = keep | ~F.expr(if_expr)
        return df.filter(keep)
    return df
