from .iceberg import TableSink, has_iceberg, iceberg_confs  # noqa: F401
from .writers import (  # noqa: F401
    FailoverSink,
    FileSink,
    load_balance,
    round_robin,
    write_otlp_json,
    write_routed,
)
