"""Resource detection: stamp environment-derived resource attributes.

Reference: processor/resourcedetectionprocessor/config.go:27-44 — an
ordered list of named detectors fills the resource map; ``override``
chooses whether detected values replace existing keys; ``attributes``
is an allowlist of keys to add.

Detection happens ONCE on the driver (the collector likewise detects at
process start, not per record); the result is a handful of ``lit()``
entries merged into the ``resource`` map column — zero per-row cost.
Cloud-metadata detectors (ec2/gcp/aks/...) need network calls and are
out of the sandbox's scope; ``env`` (OTEL_RESOURCE_ATTRIBUTES) and
``system`` (host.name / os.type, internal/system/system.go semantics)
cover the log-pipeline slice.
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
    platform_ = meta.get("platform", "gce")
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


DETECTORS = {"env": _detect_env, "system": _detect_system}
CLOUD_DETECTORS = {
    "ec2": _detect_ec2,
    "gcp": _detect_gcp,
    "azure": _detect_azure,
    "docker": _detect_docker,
    "heroku": _detect_heroku,
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
