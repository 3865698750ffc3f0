"""UDP input golden port + stream/batch parity.

Reference test table: ``pkg/stanza/operator/input/udp/input_test.go``
TestInput/TestInputAttributes (Simple / TrailingNewlines /
TrailingCRNewlines / NewlineInMessage) — one datagram in, the expected
entry body out, with the default never-splitting config preserving
embedded newlines. Trailing-trim semantics from
removeTrailingCharactersAndNULsFromBuffer (input.go:237-243).
"""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.sources.udp import (
    MAX_UDP_SIZE,
    UdpInput,
)

# (name, raw datagram, expected bodies) — input_test.go:144-148 verbatim
CASES = [
    ("Simple", b"message1", ["message1"]),
    ("TrailingNewlines", b"message1\n", ["message1"]),
    ("TrailingCRNewlines", b"message1\r\n", ["message1"]),
    ("NewlineInMessage", b"message1\nmessage2\n", ["message1\nmessage2"]),
    ("TrailingNULs", b"message1\x00\x00", ["message1"]),
]


@pytest.fixture(scope="module")
def udp_out(spark):
    rows = [(i, bytearray(raw)) for i, (_, raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id int, data binary")
    got = {}
    for r in UdpInput()(df).collect():
        got.setdefault(r.id, []).append((r.frame_idx, r.body))
    return {k: [b for _, b in sorted(v)] for k, v in got.items()}


@pytest.mark.parametrize("idx,name", [(i, c[0]) for i, c in enumerate(CASES)])
def test_udp_default_config_case(udp_out, idx, name):
    assert udp_out[idx] == CASES[idx][2], name


def test_udp_one_log_per_packet_keeps_newlines(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"a\nb\n"))], "id int, data binary"
    )
    rows = UdpInput(one_log_per_packet=True)(df).collect()
    assert [r.body for r in rows] == ["a\nb"]


def test_udp_line_end_pattern_splits(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"m1\nm2\nm3\n"))], "id int, data binary"
    )
    rows = sorted(
        UdpInput(line_end_pattern="\r?\n")(df).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.body for r in rows] == ["m1", "m2", "m3"]


def test_udp_max_size_truncation(spark):
    big = b"x" * (MAX_UDP_SIZE + 100)
    df = spark.createDataFrame([(0, bytearray(big))], "id int, data binary")
    rows = UdpInput()(df).collect()
    assert len(rows[0].body) == MAX_UDP_SIZE


def test_udp_add_attributes(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"message1"), "10.0.0.2", 5514, "10.0.0.1", 514)],
        "id int, data binary, remote_ip string, remote_port int, "
        "local_ip string, local_port int",
    )
    r = UdpInput(add_attributes=True)(df).collect()[0]
    attrs = dict(r.attributes)
    assert attrs["net.transport"] == "IP.UDP"
    assert attrs["net.peer.ip"] == "10.0.0.2"
    assert attrs["net.peer.port"] == "5514"
    assert attrs["net.host.ip"] == "10.0.0.1"
    assert attrs["net.host.port"] == "514"
    # no *_host column captured -> name falls back to the ip
    assert attrs["net.peer.name"] == "10.0.0.2"
    assert attrs["net.host.name"] == "10.0.0.1"


def test_udp_add_attributes_resolved_names(spark):
    df = spark.createDataFrame(
        [(0, bytearray(b"m"), "127.0.0.1", "localhost")],
        "id int, data binary, remote_ip string, remote_host string",
    )
    r = UdpInput(add_attributes=True)(df).collect()[0]
    attrs = dict(r.attributes)
    assert attrs["net.peer.name"] == "localhost"
    # unset locals are excluded entirely (AddAttribute only fires when
    # the addr is present)
    assert "net.host.ip" not in attrs


def test_udp_non_utf8_encoding(spark):
    raw = "héllo".encode("latin-1") + b"\n"
    df = spark.createDataFrame([(0, bytearray(raw))], "id int, data binary")
    r = UdpInput(encoding="iso-8859-1")(df).collect()[0]
    assert r.body == "héllo"


def test_syslog_over_udp_golden(spark):
    # receiver/syslogreceiver/syslog_test.go TestSyslogWithUdp: five
    # RFC5424 datagrams -> timestamps 1614470402003000000 + i*60s ns and
    # attributes["message"] == "test msg i".  The receiver is the
    # composition UdpInput -> SyslogParser (syslog.go:61-71 wires the
    # udp input into the syslog parser); trailing \n trimmed by the udp
    # trim, exactly like the reference's moving parts.
    from opentelemetry_collector_contrib_spark.operators.parsers import SyslogParser

    rows = [
        (
            i,
            bytearray(
                f"<86>1 2021-02-28T00:0{i}:02.003Z 192.168.1.1 SecureAuth0 "
                f"23108 ID52020 [SecureAuth@27389] test msg {i}\n".encode()
            ),
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "id int, data binary")
    out = SyslogParser(protocol="rfc5424")(UdpInput()(df))
    got = sorted(out.collect(), key=lambda r: r.id)
    assert len(got) == 5
    for i, r in enumerate(got):
        ns = int(r.event_ts.timestamp() * 1_000_000) * 1000
        assert ns == 1614470402003000000 + i * 60 * 1_000_000_000
        assert r.message == f"test msg {i}"
        assert r.hostname == "192.168.1.1"
        assert r.appname == "SecureAuth0"


def test_udp_stream_batch_parity(spark, tmp_path):
    # the operator is a pure stateless projection, so the SAME call
    # applies to a streaming frame — parity with the batch result over
    # identical datagrams is the stream contract
    rows = [(i, bytearray(raw)) for i, (_, raw, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "id int, data binary")
    src = str(tmp_path / "udp_in")
    df.write.parquet(src)
    stream = spark.readStream.schema("id int, data binary").parquet(src)
    out = UdpInput()(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("udp_parity")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.id, r.frame_idx, r.body)
        for r in spark.sql("select * from udp_parity").collect()
    }
    want = {(r.id, r.frame_idx, r.body) for r in UdpInput()(df).collect()}
    assert got == want
