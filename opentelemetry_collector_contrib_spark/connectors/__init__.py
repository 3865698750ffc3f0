from .count import CountConnector, MetricDef  # noqa: F401
from .exceptions import ExcDimension, ExceptionsConnector  # noqa: F401
from .grafanacloud import GrafanaCloudConnector  # noqa: F401
from .routing import RoutingConnector, Route  # noqa: F401
from .spanmetrics import SpanMetricsConnector  # noqa: F401
from .servicegraph import ServiceGraphConnector, SpanServiceGraph  # noqa: F401
