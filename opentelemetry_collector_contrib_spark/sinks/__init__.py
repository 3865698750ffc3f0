from .iceberg import TableSink, has_iceberg, iceberg_confs  # noqa: F401
from .writers import FileSink, write_otlp_json, write_routed  # noqa: F401
