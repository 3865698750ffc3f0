from .writers import FileSink, write_routed  # noqa: F401
