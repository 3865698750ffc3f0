from .filelog import FileLogSource  # noqa: F401
from .journald import JournaldSource  # noqa: F401
from .otlpjson import OtlpJsonFileSource  # noqa: F401
from .pipes import NamedPipeSource, StdinSource  # noqa: F401
from .socket import split_newline_frames, split_octet_frames  # noqa: F401
from .table import SnapshotTable  # noqa: F401
from .udp import UdpInput  # noqa: F401
