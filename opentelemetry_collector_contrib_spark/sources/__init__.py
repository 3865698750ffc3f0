from .filelog import FileLogSource  # noqa: F401
from .otlpjson import OtlpJsonFileSource  # noqa: F401
from .table import SnapshotTable  # noqa: F401
