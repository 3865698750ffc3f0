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
    _detect_consul,
    _detect_docker,
    _detect_ec2,
    _detect_ecs,
    _detect_eks,
    _detect_elasticbeanstalk,
    _detect_gcp,
    _detect_heroku,
    _detect_k8snode,
    _detect_lambda,
    _detect_openshift,
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


def test_ecs_old_arn_golden():
    # ecs_test.go taskArnVersion=1: arn:aws:ecs:us-west-2:123456789123:task/123
    meta = {
        "task_arn": "arn:aws:ecs:us-west-2:123456789123:task/123",
        "cluster": "my-cluster",
        "family": "family",
        "revision": "26",
        "availability_zone": "us-west-2a",
        "launch_type": "EC2",
    }
    assert _detect_ecs(meta) == {
        "cloud.provider": "aws",
        "cloud.platform": "aws_ecs",
        "aws.ecs.task.arn": "arn:aws:ecs:us-west-2:123456789123:task/123",
        "aws.ecs.task.family": "family",
        "aws.ecs.task.revision": "26",
        "aws.ecs.task.id": "123",
        "cloud.region": "us-west-2",
        "cloud.account.id": "123456789123",
        "cloud.availability_zone": "us-west-2a",
        "aws.ecs.cluster.arn": "arn:aws:ecs:us-west-2:123456789123:cluster/my-cluster",
        "aws.ecs.launchtype": "ec2",
    }


def test_ecs_new_arn_task_id_and_fargate():
    # taskArnVersion=2: task/my-cluster/123 -> task id is the LAST part
    meta = {
        "task_arn": "arn:aws:ecs:us-west-2:123456789123:task/my-cluster/123",
        "cluster": "arn:aws:ecs:us-west-2:123456789123:cluster/my-cluster",
        "launch_type": "Fargate",
    }
    got = _detect_ecs(meta)
    assert got["aws.ecs.task.id"] == "123"
    # already-an-ARN cluster passes through (constructClusterArn)
    assert (
        got["aws.ecs.cluster.arn"]
        == "arn:aws:ecs:us-west-2:123456789123:cluster/my-cluster"
    )
    assert got["aws.ecs.launchtype"] == "fargate"
    # unknown launch types are not stamped (ecs.go:90-95 switch default)
    assert "aws.ecs.launchtype" not in _detect_ecs(
        {"task_arn": meta["task_arn"], "launch_type": "external"}
    )
    assert _detect_ecs({}) == {}


def test_eks_golden():
    assert _detect_eks({"cluster_name": "my-cluster"}) == {
        "cloud.provider": "aws",
        "cloud.platform": "aws_eks",
        "k8s.cluster.name": "my-cluster",
    }
    # detector.go:88-96: platform stamped even without a cluster name
    assert _detect_eks({"present": True}) == {
        "cloud.provider": "aws",
        "cloud.platform": "aws_eks",
    }
    assert _detect_eks({}) == {}


def test_elasticbeanstalk_golden():
    # elasticbeanstalk.go:70-74: deployment id is an int in the conf doc
    meta = {
        "deployment_id": 23,
        "environment_name": "BETA",
        "version_label": "v1",
    }
    assert _detect_elasticbeanstalk(meta) == {
        "cloud.provider": "aws",
        "cloud.platform": "aws_elastic_beanstalk",
        "service.instance.id": "23",
        "deployment.environment": "BETA",
        "service.version": "v1",
    }
    assert _detect_elasticbeanstalk({}) == {}


def test_lambda_golden():
    # lambda_test.go TestLambda: only the function name set -> the
    # minimal three-attribute resource
    meta = {"AWS_LAMBDA_FUNCTION_NAME": "TestFunctionName"}
    assert _detect_lambda(meta) == {
        "cloud.provider": "aws",
        "cloud.platform": "aws_lambda",
        "faas.name": "TestFunctionName",
    }
    # TestNotLambda: no function name -> empty resource
    assert _detect_lambda({}) == {}
    full = _detect_lambda(
        {
            "AWS_LAMBDA_FUNCTION_NAME": "fn",
            "AWS_REGION": "us-east-1",
            "AWS_LAMBDA_FUNCTION_VERSION": "$LATEST",
            "AWS_LAMBDA_FUNCTION_MEMORY_SIZE": "128",
            "AWS_LAMBDA_LOG_GROUP_NAME": "/aws/lambda/fn",
            "AWS_LAMBDA_LOG_STREAM_NAME": "2024/01/01/[$LATEST]abc",
        }
    )
    assert full["cloud.region"] == "us-east-1"
    assert full["faas.version"] == "$LATEST"
    assert full["faas.max_memory"] == "128"
    # faas.instance is the log stream name (lambda.go:66-69)
    assert full["faas.instance"] == "2024/01/01/[$LATEST]abc"
    assert full["aws.log.group.names"] == "/aws/lambda/fn"
    assert full["aws.log.stream.names"] == "2024/01/01/[$LATEST]abc"


def test_consul_golden():
    # consul_test.go TestDetect: hostname/dc1/nodeID + Meta{test:test}
    meta = {
        "hostname": "hostname",
        "datacenter": "dc1",
        "node_id": "00000000-0000-0000-0000-000000000000",
        "host_metadata": {"test": "test"},
    }
    assert _detect_consul(meta) == {
        "host.name": "hostname",
        "cloud.region": "dc1",
        "host.id": "00000000-0000-0000-0000-000000000000",
        "test": "test",
    }
    assert _detect_consul({}) == {}


def test_k8snode_golden():
    assert _detect_k8snode({"node_uid": "uid-1", "node_name": "node-1"}) == {
        "k8s.node.uid": "uid-1",
        "k8s.node.name": "node-1",
    }
    # k8snode.go:52-70: each attribute individually optional
    assert _detect_k8snode({"node_name": "node-1"}) == {"k8s.node.name": "node-1"}
    assert _detect_k8snode({}) == {}


def test_openshift_platform_switch_golden():
    # openshift.go:63-88: per-platform provider/platform + lowercased region
    base = {"infrastructure_name": "OCP-cluster"}
    aws = _detect_openshift(dict(base, platform="AWS", region="US-East-1"))
    assert aws == {
        "k8s.cluster.name": "OCP-cluster",
        "cloud.provider": "aws",
        "cloud.platform": "aws_openshift",
        "cloud.region": "us-east-1",
    }
    azure = _detect_openshift(dict(base, platform="Azure", region="AzurePublicCloud"))
    assert azure["cloud.platform"] == "azure_openshift"
    gcp = _detect_openshift(dict(base, platform="GCP", region="us-central1"))
    assert gcp["cloud.platform"] == "gcp_openshift"
    ibm = _detect_openshift(dict(base, platform="IBMCloud", region="us-south"))
    assert ibm["cloud.provider"] == "ibm_cloud"
    assert ibm["cloud.platform"] == "ibm_cloud_openshift"
    # openstack stamps region only, no provider/platform
    osk = _detect_openshift(dict(base, platform="OpenStack", region="RegionOne"))
    assert osk == {"k8s.cluster.name": "OCP-cluster", "cloud.region": "regionone"}
    # unknown platform -> no region either (switch default)
    unk = _detect_openshift(dict(base, platform="Nutanix", region="x"))
    assert unk == {"k8s.cluster.name": "OCP-cluster"}
    assert _detect_openshift({}) == {}


def test_all_cloud_detectors_registered():
    assert set(CLOUD_DETECTORS) == {
        "ec2",
        "gcp",
        "azure",
        "docker",
        "heroku",
        "ecs",
        "eks",
        "elasticbeanstalk",
        "lambda",
        "consul",
        "k8snode",
        "openshift",
    }
