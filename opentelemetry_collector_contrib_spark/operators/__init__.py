from .base import Operator, chain  # noqa: F401
from .parsers import (  # noqa: F401
    ContainerParser,
    CsvParser,
    JsonArrayParser,
    JsonParser,
    KeyValueParser,
    RegexParser,
    ScopeNameParser,
    SeverityParser,
    SyslogParser,
    TimeParser,
    TraceParser,
    UriParser,
)
from .recombine import Recombine  # noqa: F401
from .temporal import hypertable_rollup, join_asof, join_range  # noqa: F401
from .transformers import (  # noqa: F401
    Add,
    AssignKeys,
    Copy,
    Filter,
    Flatten,
    Move,
    Noop,
    Remove,
    Retain,
    Router,
    Unquote,
)
