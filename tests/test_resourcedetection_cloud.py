"""Cloud resource-detector golden ports.

Reference fixtures transcribed from:
- internal/aws/ec2/ec2_test.go TestDetector_Detect "success" /
  "success with tags"
- internal/heroku/heroku_test.go TestDetectTrue / TestDetectTruePartial
- internal/azure/azure_test.go TestDetectAzureAvailable
- internal/gcp/gcp_test.go (GCE / GKE branch attribute sets,
  gcp.go:76-86,147-157)
- internal/docker/docker_test.go TestDetect

The detectors are pure metadata->attribute mappings here (the IMDS /
daemon fetch is an environment concern); the goldens check the exact
key/value sets the reference's ResourceBuilder emits, plus the
compiler-reachable path through ResourceDetection.
"""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.processors.resourcedetection import (
    CLOUD_DETECTORS,
    ResourceDetection,
    _detect_azure,
    _detect_docker,
    _detect_ec2,
    _detect_gcp,
    _detect_heroku,
)

EC2_META = {
    "region": "us-west-2",
    "account_id": "account1234",
    "availability_zone": "us-west-2a",
    "instance_id": "i-abcd1234",
    "image_id": "abcdef",
    "instance_type": "c4.xlarge",
    "hostname": "example-hostname",
}


def test_ec2_success_golden():
    # ec2_test.go "success"
    assert _detect_ec2(EC2_META) == {
        "cloud.account.id": "account1234",
        "cloud.provider": "aws",
        "cloud.platform": "aws_ec2",
        "cloud.region": "us-west-2",
        "cloud.availability_zone": "us-west-2a",
        "host.id": "i-abcd1234",
        "host.image.id": "abcdef",
        "host.type": "c4.xlarge",
        "host.name": "example-hostname",
    }


def test_ec2_success_with_tags_golden():
    # ec2_test.go "success with tags": regexes ^tag1$ ^tag2$
    meta = dict(
        EC2_META,
        tags={"tag1": "val1", "tag2": "val2", "other": "nope"},
        tag_key_regexes=["^tag1$", "^tag2$"],
    )
    got = _detect_ec2(meta)
    assert got["ec2.tag.tag1"] == "val1"
    assert got["ec2.tag.tag2"] == "val2"
    assert "ec2.tag.other" not in got


def test_ec2_metadata_unavailable_empty():
    # ec2.go:80-83: no instance id -> empty resource, no error
    assert _detect_ec2({}) == {}
    assert _detect_ec2(None) == {}


def test_heroku_detect_true_golden():
    # heroku_test.go TestDetectTrue
    meta = {
        "dyno_id": "foo",
        "app_id": "appid",
        "app_name": "appname",
        "release_created_at": "createdat",
        "release_version": "v1",
        "slug_commit": "23456",
    }
    assert _detect_heroku(meta) == {
        "heroku.app.id": "appid",
        "service.name": "appname",
        "service.instance.id": "foo",
        "heroku.release.commit": "23456",
        "heroku.release.creation_timestamp": "createdat",
        "service.version": "v1",
        "cloud.provider": "heroku",
    }


def test_heroku_partial_golden():
    # heroku_test.go TestDetectTruePartial: unset keys simply absent
    meta = {
        "dyno_id": "foo",
        "app_id": "appid",
        "app_name": "appname",
        "release_version": "v1",
    }
    assert _detect_heroku(meta) == {
        "heroku.app.id": "appid",
        "service.name": "appname",
        "service.instance.id": "foo",
        "service.version": "v1",
        "cloud.provider": "heroku",
    }


def test_azure_golden():
    # azure.go:62-74 attribute set; compute.Name doubles as
    # azure.vm.name alongside host.name
    meta = {
        "vm_id": "02aab8a4-74ef-476e-8182-f6d2ba4166a6",
        "name": "vm-name",
        "location": "location",
        "subscription_id": "subscriptionID",
        "vm_size": "vmSize",
        "vm_scaleset_name": "myScaleset",
        "resource_group_name": "resourceGroup",
    }
    got = _detect_azure(meta)
    assert got == {
        "cloud.provider": "azure",
        "cloud.platform": "azure_vm",
        "host.name": "vm-name",
        "cloud.region": "location",
        "host.id": "02aab8a4-74ef-476e-8182-f6d2ba4166a6",
        "cloud.account.id": "subscriptionID",
        "azure.vm.name": "vm-name",
        "azure.vm.size": "vmSize",
        "azure.vm.scaleset.name": "myScaleset",
        "azure.resourcegroup.name": "resourceGroup",
    }
    assert _detect_azure({}) == {}


def test_gcp_gce_golden():
    # gcp.go:147-157 GCE branch; SetZoneAndRegion derives the region by
    # stripping the zone's trailing "-<letter>"
    meta = {
        "platform": "gce",
        "project_id": "my-project",
        "zone": "us-central1-c",
        "machine_type": "n1-standard1",
        "instance_id": "1472385723456792345",
        "instance_name": "my-gke-node-1234",
        "instance_hostname": "custom.dns.example.com",
    }
    assert _detect_gcp(meta) == {
        "cloud.provider": "gcp",
        "cloud.account.id": "my-project",
        "cloud.platform": "gcp_compute_engine",
        "cloud.availability_zone": "us-central1-c",
        "cloud.region": "us-central1",
        "host.type": "n1-standard1",
        "host.id": "1472385723456792345",
        "host.name": "my-gke-node-1234",
        "gcp.gce.instance.hostname": "custom.dns.example.com",
        "gcp.gce.instance.name": "my-gke-node-1234",
    }


def test_gcp_gke_zone_vs_region():
    # gcp.go:76-86 GKE branch; SetZoneOrRegion: two dashes = zone
    base = {
        "platform": "gke",
        "project_id": "my-project",
        "cluster_name": "my-cluster",
        "instance_id": "1472385723456792345",
        "instance_name": "my-gke-node-1234",
    }
    zonal = _detect_gcp(dict(base, zone_or_region="us-central1-c"))
    assert zonal["cloud.platform"] == "gcp_kubernetes_engine"
    assert zonal["cloud.availability_zone"] == "us-central1-c"
    assert "cloud.region" not in zonal
    assert zonal["k8s.cluster.name"] == "my-cluster"
    regional = _detect_gcp(dict(base, zone_or_region="us-central1"))
    assert regional["cloud.region"] == "us-central1"
    assert "cloud.availability_zone" not in regional


def test_docker_golden():
    assert _detect_docker({"hostname": "hostname", "os_type": "LINUX"}) == {
        "host.name": "hostname",
        "os.type": "linux",
    }
    assert _detect_docker({}) == {}


def test_cloud_detector_reachable_from_processor(spark):
    # compiler path: cloud detectors participate in the ordered
    # first-wins merge like env/system (resourcedetection.go merge
    # semantics, override honored on the frame's existing resource)
    df = spark.createDataFrame(
        [(0, {"cloud.provider": "old"})],
        "id int, resource map<string,string>",
    )
    proc = ResourceDetection(
        detectors=["ec2"],
        detector_configs={"ec2": EC2_META},
    )
    r = proc(df).collect()[0]
    res = dict(r.resource)
    assert res["cloud.provider"] == "aws"  # override=True replaces
    assert res["host.id"] == "i-abcd1234"
    # no-override keeps the existing value
    r2 = ResourceDetection(
        detectors=["ec2"], detector_configs={"ec2": EC2_META}, override=False
    )(df).collect()[0]
    assert dict(r2.resource)["cloud.provider"] == "old"


def test_all_cloud_detectors_registered():
    assert set(CLOUD_DETECTORS) == {"ec2", "gcp", "azure", "docker", "heroku"}
