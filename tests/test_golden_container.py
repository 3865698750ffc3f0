"""Verbatim port of the container parser's TestProcess +
TestRecombineProcess essentials.

Reference: pkg/stanza/operator/parser/container/parser_test.go:96-190
(docker explicit/auto-detect, metadata-from-file-path) and
parser.go:28-54 (format patterns + k8s path mapping).
"""

from __future__ import annotations

from datetime import datetime

from opentelemetry_collector_contrib_spark.operators.parsers import ContainerParser

DOCKER_LINE = (
    '{"log":"INFO: log line here","stream":"stdout",'
    '"time":"2029-03-30T08:31:20.545192187Z"}'
)
POD_PATH = (
    "/var/log/pods/some_kube-scheduler-kind-control-plane_"
    "49cc7c1fd3702c40b2686ea7486091d3/kube-scheduler44/1.log"
)


def test_docker_and_autodetect(spark):
    df = spark.createDataFrame([(DOCKER_LINE,)], "body string")
    r = ContainerParser()(df).collect()[0]
    assert r.log == "INFO: log line here"
    assert r.stream == "stdout"
    # ns -> us truncation of the 545192187 fraction
    assert r.event_ts == datetime(2029, 3, 30, 8, 31, 20, 545192)
    assert r.partial is False


def test_metadata_from_file_path(spark):
    df = spark.createDataFrame(
        [(DOCKER_LINE, POD_PATH)], "body string, `log.file.path` string"
    )
    r = ContainerParser(add_metadata_from_file_path=True)(df).collect()[0]
    assert r.k8s_pod_name == "kube-scheduler-kind-control-plane"
    assert r.k8s_pod_uid == "49cc7c1fd3702c40b2686ea7486091d3"
    assert r.k8s_container_name == "kube-scheduler44"
    assert r.k8s_container_restart_count == "1"
    assert r.k8s_namespace_name == "some"


def test_metadata_path_no_match(spark):
    df = spark.createDataFrame(
        [(DOCKER_LINE, "/tmp/not-a-pod-path.log")],
        "body string, `log.file.path` string",
    )
    r = ContainerParser(add_metadata_from_file_path=True)(df).collect()[0]
    assert r.k8s_pod_name is None and r.k8s_namespace_name is None


def test_crio_and_containerd_formats(spark):
    rows = [
        # containerd: rfc3339 Z + logtag
        ("2024-04-13T07:59:37.505201169Z stdout F containerd line",),
        # crio: non-Z timestamp
        ("2024-04-13T07:59:37.505201169-10:00 stderr P partial crio",),
    ]
    df = spark.createDataFrame(rows, "body string")
    out = sorted(ContainerParser()(df).collect(), key=lambda r: r.stream)
    assert out[1].log == "containerd line" and out[1].partial is False
    assert out[0].log == "partial crio" and out[0].partial is True
    assert out[0].stream == "stderr"
