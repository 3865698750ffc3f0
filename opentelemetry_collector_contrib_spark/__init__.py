"""PySpark-native log/telemetry analytics engine.

A from-scratch reimplementation of the query semantics of the
OpenTelemetry Collector's log pipeline (reference:
sam6134/opentelemetry-collector-contrib, see SURVEY.md) as a
parse -> enrich -> route -> aggregate DAG over Spark DataFrames.

Architecture is Spark-first: every operator compiles to declarative
DataFrame/Column expressions so Catalyst handles pushdown, pruning
and codegen; Arrow-vectorized pandas UDFs are used only where no
built-in expression exists (none in the hot path today).

Subpackages
-----------
- ``data``        synthetic/derived transcript tables (canonical payload)
- ``sources``     file/json/table sources (filelog/otlpjson receiver semantics)
- ``operators``   stanza operator equivalents (parsers, transformers, recombine)
- ``functions``   OTTL-lite expression library + statement compiler
- ``processors``  pdata-level processors (attributes, filter, transform, ...)
- ``connectors``  routing + count connectors
- ``sinks``       exporter-shaped writers (file/parquet, group_by partitioning)
- ``plans``       declarative pipeline config -> compiled DataFrame DAG
- ``streaming``   Structured Streaming variants
- ``training``    large-scale training-data ops (dedup, similarity, text stats)
"""

__version__ = "0.1.0"
