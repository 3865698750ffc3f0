from .attributes import AttributesProcessor, Action  # noqa: F401
from .enrich import (  # noqa: F401
    CidrEnrich,
    GeoIpEnrich,
    LookupEnrich,
    ipv4_to_long,
    probe_ip_attr,
)
from .filter import (  # noqa: F401
    FilterMetricsProcessor,
    FilterProcessor,
    FilterSpansProcessor,
    LogMatchProperties,
    MetricMatchProperties,
    SpanMatchProperties,
)
from .groupbyattrs import GroupByAttrs  # noqa: F401
from .k8sattributes import (  # noqa: F401
    AssociationRule,
    AssociationSource,
    K8sAttributes,
)
from .redaction import Redaction  # noqa: F401
from .sumologic import (  # noqa: F401
    AggregationPair,
    NestingConfig,
    SumoLogicProcessor,
)
from .resourcedetection import ResourceDetection  # noqa: F401
from .sampler import ProbabilisticSampler  # noqa: F401
from .span import SpanProcessor, ToAttributeRule  # noqa: F401
from .tail_sampling import GroupByTrace, TailPolicy, TailSampling  # noqa: F401
from .transform import TransformProcessor  # noqa: F401
from .datapoints import DataPointFilter, DataPointTransform  # noqa: F401
from .metrics_state import (  # noqa: F401
    CumulativeToDelta,
    CumulativeToDeltaHistogram,
    DeltaToCumulative,
    DeltaToRate,
    IntervalProcessor,
)
from .expo import DeltaToCumulativeExpo, collapse, downscale  # noqa: F401
from . import transform_metrics  # noqa: F401
from .metrics_transform import (  # noqa: F401
    GenerationRule,
    MetricOp,
    MetricTransform,
    MetricsGeneration,
    MetricsTransform,
)
from .remotetap import RemoteTap  # noqa: F401
from .schema import SchemaProcessor  # noqa: F401
