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


DETECTORS = {"env": _detect_env, "system": _detect_system}


@dataclass
class ResourceDetection:
    detectors: list[str] = field(default_factory=lambda: ["env", "system"])
    override: bool = True
    attributes: list[str] | None = None  # allowlist of keys to add

    def __call__(self, df: DataFrame) -> DataFrame:
        detected: dict[str, str] = {}
        for name in self.detectors:
            if callable(name):
                found = name()  # injectable detector (test/mocking path)
            elif name in DETECTORS:
                found = DETECTORS[name]()
            else:
                raise ValueError(
                    f"unknown detector {name!r} (supported: {sorted(DETECTORS)})"
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
