"""Transform processor: ordered statement groups with error modes.

Reference: processor/transformprocessor/config.go:31-43 + OTTL execution
semantics (pkg/ottl/parser.go:230-280): statements run IN ORDER, each
optionally guarded by a ``where`` clause; ErrorMode ``ignore``/``silent``
skips failing statements, ``propagate`` aborts.

Spark restatement (SURVEY.md 3.2): each statement compiles to a guarded
projection; the chain composes sequentially into ONE select per group so
Catalyst can fuse/CSE while order-sensitivity is preserved by dataflow
construction. Statements are OTTL-lite strings compiled by
functions.ottl, or raw (target, Column) pairs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..functions.ottl import compile_statement


@dataclass
class TransformProcessor:
    statements: list[str]
    error_mode: str = "propagate"  # propagate|ignore|silent

    def __call__(self, df: DataFrame) -> DataFrame:
        for stmt in self.statements:
            step = compile_statement(stmt, error_mode=self.error_mode)
            df = step(df)
        return df
