from .writers import FileSink, write_otlp_json, write_routed  # noqa: F401
