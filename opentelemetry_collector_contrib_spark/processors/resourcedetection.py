"""Resource detection: stamp environment-derived resource attributes.

Reference: processor/resourcedetectionprocessor/config.go:27-44 — an
ordered list of named detectors fills the resource map; ``override``
chooses whether detected values replace existing keys; ``attributes``
is an allowlist of keys to add.

Detection happens ONCE on the driver (the collector likewise detects at
process start, not per record); the result is a handful of ``lit()``
entries merged into the ``resource`` map column — zero per-row cost.
``env`` (OTEL_RESOURCE_ATTRIBUTES) and ``system`` (host.name /
os.type, internal/system/system.go semantics) detect from the driver
environment directly; the twelve cloud detectors (ec2/gcp/azure/
docker/heroku/ecs/eks/elasticbeanstalk/lambda/consul/k8snode/
openshift) are the reference's metadata-document -> semconv-attribute
mappings, fed the already-captured metadata via ``detector_configs``
(the IMDS/daemon fetch itself is an environment concern — no place
for an HTTP call inside a Spark scan).
"""

from __future__ import annotations

import os
import platform
import socket
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _detect_env() -> dict[str, str]:
    raw = os.environ.get("OTEL_RESOURCE_ATTRIBUTES", "")
    out: dict[str, str] = {}
    for pair in raw.split(","):
        if "=" in pair:
            k, v = pair.split("=", 1)
            if k.strip():
                out[k.strip()] = v.strip()
    return out


def _detect_system() -> dict[str, str]:
    return {
        "host.name": socket.gethostname(),
        "os.type": platform.system().lower(),
    }


# -- cloud detectors -------------------------------------------------------
#
# The reference's cloud detectors (internal/{aws/ec2,gcp,azure,docker,
# heroku}) each call a metadata endpoint ONCE at collector start and
# stamp the answer onto every record's resource. The metadata FETCH is
# an environment concern (an IMDS HTTP call has no place in a Spark
# scan; on a cluster the submitter or edge agent captures it); the
# DETECTOR is the mapping from the metadata document to semconv
# attribute names, and that mapping is what's ported here — each
# detector takes the already-captured metadata dict (via
# ``ResourceDetection.detector_configs``) and emits the exact key set
# the reference's ResourceBuilder emits. An empty/absent metadata dict
# yields an empty resource, like EC2's "metadata unavailable" debug path
# (internal/aws/ec2/ec2.go:80-83).


def _zone_to_region(zone: str) -> str:
    # gcp SetZoneAndRegion: region = zone minus the trailing "-<letter>"
    return zone.rsplit("-", 1)[0] if "-" in zone else zone


def _detect_ec2(meta: dict | None = None) -> dict[str, str]:
    """internal/aws/ec2/ec2.go:79-103 (Detect). ``tags`` entries are
    stamped as ``ec2.tag.<key>`` filtered by ``tag_key_regexes``."""
    meta = meta or {}
    if not meta.get("instance_id"):
        return {}
    out = {
        "cloud.provider": "aws",
        "cloud.platform": "aws_ec2",
    }
    for attr, key in [
        ("cloud.region", "region"),
        ("cloud.account.id", "account_id"),
        ("cloud.availability_zone", "availability_zone"),
        ("host.id", "instance_id"),
        ("host.image.id", "image_id"),
        ("host.type", "instance_type"),
        ("host.name", "hostname"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    import re as _re

    regexes = [_re.compile(p) for p in meta.get("tag_key_regexes", [])]
    if regexes:
        for k, v in meta.get("tags", {}).items():
            if any(r.match(k) for r in regexes):
                out[f"ec2.tag.{k}"] = str(v)
    return out


def _detect_gcp(meta: dict | None = None) -> dict[str, str]:
    """internal/gcp/gcp.go Detect — GCE (gcp.go:147-157) and GKE
    (gcp.go:76-86) platform branches; unknown platforms emit provider +
    project only (the reference's default case keeps what it has)."""
    meta = meta or {}
    if not meta:
        return {}
    out = {"cloud.provider": "gcp"}
    if meta.get("project_id"):
        out["cloud.account.id"] = str(meta["project_id"])
    # no default: gcp.go's switch default emits provider + project only,
    # so a missing platform behaves like an unknown one
    platform_ = meta.get("platform")
    if platform_ == "gce":
        out["cloud.platform"] = "gcp_compute_engine"
        if meta.get("zone"):
            out["cloud.availability_zone"] = str(meta["zone"])
            out["cloud.region"] = _zone_to_region(str(meta["zone"]))
        for attr, key in [
            ("host.type", "machine_type"),
            ("host.id", "instance_id"),
            ("host.name", "instance_name"),
            ("gcp.gce.instance.hostname", "instance_hostname"),
            ("gcp.gce.instance.name", "instance_name"),
        ]:
            if meta.get(key):
                out[attr] = str(meta[key])
    elif platform_ == "gke":
        out["cloud.platform"] = "gcp_kubernetes_engine"
        # SetZoneOrRegion: a zone has two dashes, a region one
        loc = str(meta.get("zone_or_region", ""))
        if loc:
            if loc.count("-") == 2:
                out["cloud.availability_zone"] = loc
            else:
                out["cloud.region"] = loc
        for attr, key in [
            ("k8s.cluster.name", "cluster_name"),
            ("host.id", "instance_id"),
            ("host.name", "instance_name"),
        ]:
            if meta.get(key):
                out[attr] = str(meta[key])
    return out


def _detect_azure(meta: dict | None = None) -> dict[str, str]:
    """internal/azure/azure.go:62-80 (Detect)."""
    meta = meta or {}
    if not meta.get("vm_id"):
        return {}
    out = {
        "cloud.provider": "azure",
        "cloud.platform": "azure_vm",
    }
    for attr, key in [
        ("host.name", "name"),
        ("cloud.region", "location"),
        ("host.id", "vm_id"),
        ("cloud.account.id", "subscription_id"),
        # azure.go:69-74: compute.Name doubles as azure.vm.name
        ("azure.vm.name", "name"),
        ("azure.vm.size", "vm_size"),
        ("azure.vm.scaleset.name", "vm_scaleset_name"),
        ("azure.resourcegroup.name", "resource_group_name"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    for k, v in meta.get("tags", {}).items():
        out[f"azure.tag.{k}"] = str(v)
    return out


def _detect_docker(meta: dict | None = None) -> dict[str, str]:
    """internal/docker/docker.go:55-61: hostname + os.type from the
    docker daemon's Info call."""
    meta = meta or {}
    out = {}
    if meta.get("hostname"):
        out["host.name"] = str(meta["hostname"])
    if meta.get("os_type"):
        out["os.type"] = str(meta["os_type"]).lower()
    return out


def _detect_heroku(meta: dict | None = None) -> dict[str, str]:
    """internal/heroku/heroku.go:40-75: env-var-driven dyno metadata."""
    meta = meta or {}
    if not meta:
        return {}
    out = {"cloud.provider": "heroku"}
    for attr, key in [
        ("service.instance.id", "dyno_id"),
        ("heroku.app.id", "app_id"),
        ("service.name", "app_name"),
        ("heroku.release.creation_timestamp", "release_created_at"),
        ("service.version", "release_version"),
        ("heroku.release.commit", "slug_commit"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    return out


def _detect_ecs(meta: dict | None = None) -> dict[str, str]:
    """internal/aws/ecs/ecs.go:56-106 (Detect): TMDE task metadata.

    ``task_arn`` is parsed per parseTaskARN (ecs.go:118-135, colon parts
    3/4 = region/account, last '/'-part of part 5 = task id); the
    cluster ARN is constructed unless ``cluster`` is already an ARN
    (constructClusterArn, ecs.go:110-115); launch type is stamped only
    for the two known values (ecs.go:90-95).  Container log data
    (addValidLogData) needs the per-container metadata fetch and stays
    out of the resource stamp here — our resource map is
    string->string and log groups are list-valued per container.
    """
    meta = meta or {}
    if not meta.get("task_arn"):
        return {}
    out = {"cloud.provider": "aws", "cloud.platform": "aws_ecs"}
    out["aws.ecs.task.arn"] = str(meta["task_arn"])
    for attr, key in [
        ("aws.ecs.task.family", "family"),
        ("aws.ecs.task.revision", "revision"),
        ("cloud.availability_zone", "availability_zone"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    parts = str(meta["task_arn"]).split(":")
    region = account = ""
    if len(parts) >= 6:
        region, account = parts[3], parts[4]
        out["aws.ecs.task.id"] = parts[5].split("/")[-1]
    if account:
        out["cloud.account.id"] = account
    if region:
        out["cloud.region"] = region
    cluster = str(meta.get("cluster", ""))
    if cluster:
        out["aws.ecs.cluster.arn"] = (
            cluster
            if ":" in cluster
            else f"arn:aws:ecs:{region}:{account}:cluster/{cluster}"
        )
    lt = str(meta.get("launch_type", "")).lower()
    if lt in ("ec2", "fargate"):
        out["aws.ecs.launchtype"] = lt
    return out


def _detect_eks(meta: dict | None = None) -> dict[str, str]:
    """internal/aws/eks/detector.go:83-96: provider/platform always,
    cluster name only when the provider captured one."""
    meta = meta or {}
    if not meta:
        return {}
    out = {"cloud.provider": "aws", "cloud.platform": "aws_eks"}
    if meta.get("cluster_name"):
        out["k8s.cluster.name"] = str(meta["cluster_name"])
    return out


def _detect_elasticbeanstalk(meta: dict | None = None) -> dict[str, str]:
    """internal/aws/elasticbeanstalk/elasticbeanstalk.go:50-76: the
    /var/elasticbeanstalk/xray/environment.conf document."""
    meta = meta or {}
    if not meta:
        return {}
    out = {
        "cloud.provider": "aws",
        "cloud.platform": "aws_elastic_beanstalk",
    }
    for attr, key in [
        ("service.instance.id", "deployment_id"),
        ("deployment.environment", "environment_name"),
        ("service.version", "version_label"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    return out


def _detect_lambda(meta: dict | None = None) -> dict[str, str]:
    """internal/aws/lambda/lambda.go:44-84: runtime env vars.  The
    reference requires AWS_LAMBDA_FUNCTION_NAME (error when absent,
    lambda.go:46-49); faas.instance doubles as the log stream name and
    the aws.log.* names are single-element lists stamped here as the
    scalar value.  Like every other cloud detector the captured
    environment arrives via ``detector_configs`` (keyed by the env-var
    names) — reading the DRIVER's os.environ would stamp the submit
    host's region/function onto records produced elsewhere."""
    meta = meta or {}
    env = {str(k): str(v) for k, v in meta.items()}
    fn = env.get("AWS_LAMBDA_FUNCTION_NAME", "")
    if not fn:
        return {}
    out = {
        "cloud.provider": "aws",
        "cloud.platform": "aws_lambda",
        "faas.name": fn,
    }
    for attr, key in [
        ("cloud.region", "AWS_REGION"),
        ("faas.version", "AWS_LAMBDA_FUNCTION_VERSION"),
        ("faas.instance", "AWS_LAMBDA_LOG_STREAM_NAME"),
        ("faas.max_memory", "AWS_LAMBDA_FUNCTION_MEMORY_SIZE"),
        ("aws.log.group.names", "AWS_LAMBDA_LOG_GROUP_NAME"),
        ("aws.log.stream.names", "AWS_LAMBDA_LOG_STREAM_NAME"),
    ]:
        if env.get(key):
            out[attr] = env[key]
    return out


def _detect_consul(meta: dict | None = None) -> dict[str, str]:
    """internal/consul/consul.go:66-84: agent self metadata plus the
    user's Meta map stamped verbatim (consul.go:78-80)."""
    meta = meta or {}
    if not meta:
        return {}
    out: dict[str, str] = {}
    for attr, key in [
        ("host.name", "hostname"),
        ("cloud.region", "datacenter"),
        ("host.id", "node_id"),
    ]:
        if meta.get(key):
            out[attr] = str(meta[key])
    for k, v in meta.get("host_metadata", {}).items():
        out[str(k)] = str(v)
    return out


def _detect_k8snode(meta: dict | None = None) -> dict[str, str]:
    """internal/k8snode/k8snode.go:52-70: node UID + name from the
    k8s API (both individually toggleable in the reference's
    ResourceAttributes config — absent keys are simply not stamped)."""
    meta = meta or {}
    out = {}
    if meta.get("node_uid"):
        out["k8s.node.uid"] = str(meta["node_uid"])
    if meta.get("node_name"):
        out["k8s.node.name"] = str(meta["node_name"])
    return out


def _detect_openshift(meta: dict | None = None) -> dict[str, str]:
    """internal/openshift/openshift.go:51-88: infrastructure name +
    per-platform provider/platform/region switch (regions lowercased,
    openstack stamps region only)."""
    meta = meta or {}
    if not meta:
        return {}
    out: dict[str, str] = {}
    if meta.get("infrastructure_name"):
        out["k8s.cluster.name"] = str(meta["infrastructure_name"])
    plat = str(meta.get("platform", "")).lower()
    region = str(meta.get("region", "")).lower()
    if plat == "aws":
        out["cloud.provider"] = "aws"
        out["cloud.platform"] = "aws_openshift"
    elif plat == "azure":
        out["cloud.provider"] = "azure"
        out["cloud.platform"] = "azure_openshift"
    elif plat == "gcp":
        out["cloud.provider"] = "gcp"
        out["cloud.platform"] = "gcp_openshift"
    elif plat == "ibmcloud":
        out["cloud.provider"] = "ibm_cloud"
        out["cloud.platform"] = "ibm_cloud_openshift"
    elif plat != "openstack":
        region = ""
    if region:
        out["cloud.region"] = region
    return out


DETECTORS = {"env": _detect_env, "system": _detect_system}
CLOUD_DETECTORS = {
    "ec2": _detect_ec2,
    "gcp": _detect_gcp,
    "azure": _detect_azure,
    "docker": _detect_docker,
    "heroku": _detect_heroku,
    "ecs": _detect_ecs,
    "eks": _detect_eks,
    "elasticbeanstalk": _detect_elasticbeanstalk,
    "lambda": _detect_lambda,
    "consul": _detect_consul,
    "k8snode": _detect_k8snode,
    "openshift": _detect_openshift,
}


@dataclass
class ResourceDetection:
    detectors: list[str] = field(default_factory=lambda: ["env", "system"])
    override: bool = True
    attributes: list[str] | None = None  # allowlist of keys to add
    # per-detector captured metadata for the cloud detectors (the
    # reference fetches these from IMDS/daemon once at start; here the
    # submitter/edge supplies them)
    detector_configs: dict[str, dict] = field(default_factory=dict)

    def __call__(self, df: DataFrame) -> DataFrame:
        detected: dict[str, str] = {}
        for name in self.detectors:
            if callable(name):
                found = name()  # injectable detector (test/mocking path)
            elif name in DETECTORS:
                found = DETECTORS[name]()
            elif name in CLOUD_DETECTORS:
                found = CLOUD_DETECTORS[name](self.detector_configs.get(name))
            else:
                raise ValueError(
                    f"unknown detector {name!r} (supported: "
                    f"{sorted(DETECTORS) + sorted(CLOUD_DETECTORS)})"
                )
            # FIRST detector wins per key: internal/resourcedetection.go
            # merges each detector's resource with override=false
            # (resourcedetection_test.go TestDetect "Detect three
            # resources": a stays "1" despite later detectors)
            for k, v in found.items():
                detected.setdefault(k, v)
        if self.attributes is not None:
            allow = set(self.attributes)
            detected = {k: v for k, v in detected.items() if k in allow}
        if not detected:
            return df
        entries = F.create_map(
            *[x for k, v in sorted(detected.items()) for x in (F.lit(k), F.lit(v))]
        )
        if "resource" not in df.columns:
            return df.withColumn("resource", entries)
        existing = F.coalesce(
            F.col("resource"), F.from_json(F.lit("{}"), "map<string,string>")
        )
        keys = list(detected)
        if self.override:
            merged = F.map_concat(
                F.map_filter(existing, lambda k, _: ~k.isin(keys)), entries
            )
        else:
            existing_keys = F.map_keys(existing)
            merged = F.map_concat(
                existing,
                F.map_filter(entries, lambda k, _: ~F.array_contains(existing_keys, k)),
            )
        return df.withColumn("resource", merged)
