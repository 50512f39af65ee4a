"""Custom Python DataSource tests (SURVEY.md §2.A A1/A2): the
remote_write_blobs source and message_bus sink drive the same wire bytes
as the file-based pipelines, via spark.read/readStream/write/writeStream.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.operators.flatten import flatten_write_requests
from prometheus_pulsar_remote_write_spark.sources import datasource, prompb, snappy_codec
from prometheus_pulsar_remote_write_spark.sources.remote_write import decode_remote_write


def _spool_body(path: str, n_samples: int) -> None:
    req = {
        "timeseries": [
            {
                "labels": [{"name": "__name__", "value": "up"}, {"name": "i", "value": str(i)}],
                "samples": [{"value": float(i), "timestamp": 1000 + i}],
            }
            for i in range(n_samples)
        ]
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(snappy_codec.compress(prompb.encode_write_request(req)))


def test_blob_source_batch_read_and_decode(spark, tmp_path):
    spool = str(tmp_path / "spool")
    _spool_body(os.path.join(spool, "team-a", "req1.bin"), 3)
    _spool_body(os.path.join(spool, "team-a", "req2.bin"), 2)
    _spool_body(os.path.join(spool, "team-b", "req3.bin"), 4)

    datasource.register(spark)
    raw = spark.read.format("remote_write_blobs").option("path", spool).load()
    assert raw.count() == 3
    tenants = {r.tenant_dir for r in raw.select("tenant_dir").collect()}
    assert tenants == {"team-a", "team-b"}

    decoded = decode_remote_write(raw, body_col="content", keep_cols=["tenant_dir"])
    samples = flatten_write_requests(decoded, ["tenant_dir"])
    per_tenant = {
        r.tenant_dir: r.n
        for r in samples.groupBy("tenant_dir").agg(F.count("*").alias("n")).collect()
    }
    assert per_tenant == {"team-a": 5, "team-b": 4}


def test_blob_source_streaming_picks_up_new_files(spark, tmp_path):
    spool = str(tmp_path / "spool")
    _spool_body(os.path.join(spool, "team-a", "req1.bin"), 2)

    datasource.register(spark)
    stream = (
        spark.readStream.format("remote_write_blobs").option("path", spool).load()
    )
    q = (
        stream.select("path", "tenant_dir", F.length("content").alias("n_bytes"))
        .writeStream.format("memory")
        .queryName("blobs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM blobs").count() >= 1:
                break
            time.sleep(0.5)
        assert spark.sql("SELECT * FROM blobs").count() == 1

        # a newly spooled body must arrive in a later micro-batch
        _spool_body(os.path.join(spool, "team-b", "req2.bin"), 1)
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM blobs").count() >= 2:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT * FROM blobs").collect()
        assert len(rows) == 2
        assert {r.tenant_dir for r in rows} == {"team-a", "team-b"}
        assert all(r.n_bytes > 0 for r in rows)
    finally:
        q.stop()


def test_message_bus_batch_write_commit_visibility(spark, tmp_path):
    out = str(tmp_path / "bus")
    datasource.register(spark)
    df = spark.createDataFrame(
        [("k1", "p1", "a"), ("k2", "p2", "b"), ("k3", "p3", "a")],
        "key string, payload string, tenant_id string",
    ).repartition(2)
    df.write.format("message_bus").option("path", out).mode("append").save()

    files = os.listdir(out)
    assert files and all(not f.startswith("_staged") for f in files)
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert {(r["key"], r["payload"], r["tenant_id"]) for r in rows} == {
        ("k1", "p1", "a"),
        ("k2", "p2", "b"),
        ("k3", "p3", "a"),
    }


def test_message_bus_stream_write(spark, tmp_path):
    out = str(tmp_path / "bus")
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "in.jsonl"), "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"key": f"k{i}", "payload": f"p{i}", "tenant_id": "t"}) + "\n")

    datasource.register(spark)
    stream = spark.readStream.schema("key string, payload string, tenant_id string").json(src)
    q = (
        stream.writeStream.format("message_bus")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = []
    for f in os.listdir(out):
        assert not f.startswith("_staged")
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert {r["key"] for r in rows} == {f"k{i}" for i in range(5)}


def test_produce_pipeline_on_custom_datasources(spark, tmp_path):
    """Full A1->A2 on the custom formats: spooled wire bodies stream in
    through remote_write_blobs, wire messages stream out through
    message_bus -- no file-source workarounds anywhere."""
    from prometheus_pulsar_remote_write_spark.streaming.produce import (
        run_produce_pipeline_datasource,
    )

    spool = str(tmp_path / "spool")
    out = str(tmp_path / "bus")
    _spool_body(os.path.join(spool, "team-a", "r1.bin"), 3)
    _spool_body(os.path.join(spool, "no-tenant", "r2.bin"), 2)

    q = run_produce_pipeline_datasource(
        spark, spool, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    rows = []
    for f in os.listdir(out):
        if f.startswith("_"):
            continue
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 5
    tenants = {r["tenant_id"] for r in rows}
    assert tenants == {"team-a", ""}
    for r in rows:
        payload = json.loads(r["payload"])
        assert payload["metric"]["__name__"] == "up"
        assert r["key"].startswith("hex ")


def test_http_listener_bridges_posts_into_blob_source(spark, tmp_path):
    """A1 transport end-to-end: real HTTP remote-write POSTs (Basic Auth /
    X-Scope-OrgID / anonymous tenants, reference handlers.go semantics)
    land in the blob spool, the remote_write_blobs batch read decodes
    them, and a poison body is refused with 400 and never spooled."""
    import base64
    import urllib.request

    from prometheus_pulsar_remote_write_spark.sources import prompb, snappy_codec
    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        RemoteWriteListener,
    )
    from prometheus_pulsar_remote_write_spark.sources.remote_write import (
        decode_remote_write,
    )

    datasource.register(spark)
    spool = str(tmp_path / "spool")
    listener = RemoteWriteListener(spool)
    host, port = listener.start()
    url = f"http://{host}:{port}/write"

    def body(name, n):
        req = {
            "timeseries": [
                {
                    "labels": [{"name": "__name__", "value": name}],
                    "samples": [
                        {"value": float(i), "timestamp": 1000 + i} for i in range(n)
                    ],
                }
            ]
        }
        return snappy_codec.compress(prompb.encode_write_request(req))

    def post(data, headers=None, path="/write"):
        r = urllib.request.Request(
            f"http://{host}:{port}{path}", data=data, headers=headers or {}
        )
        try:
            return urllib.request.urlopen(r).status
        except urllib.error.HTTPError as e:
            return e.code

    auth = {"Authorization": "Basic " + base64.b64encode(b"tenant-a:pw").decode()}
    assert post(body("m1", 3), auth) == 200
    assert post(body("m2", 2), {"X-Scope-OrgID": "tenant-b"}) == 200
    assert post(body("m3", 1)) == 200  # anonymous -> root spool
    assert post(b"not snappy at all") == 400
    assert post(body("m4", 1), path="/nope") == 404
    assert listener.accepted == 3 and listener.rejected == 1
    assert listener.accepted_by_tenant == {"tenant-a": 1, "tenant-b": 1, "": 1}
    listener.stop()

    blobs = (
        spark.read.format("remote_write_blobs").option("path", spool).load()
    )
    decoded = decode_remote_write(
        blobs, body_col="content", keep_cols=["tenant_dir"]
    )
    rows = decoded.collect()
    assert len(rows) == 3 and all(r["decode_error"] is None for r in rows)
    by_tenant = {}
    for r in rows:
        n = sum(len(ts["samples"]) for ts in r["timeseries"])
        by_tenant[r["tenant_dir"]] = by_tenant.get(r["tenant_dir"], 0) + n
    assert by_tenant == {"tenant-a": 3, "tenant-b": 2, None: 1}


def test_http_listener_rejects_traversal_tenants(tmp_path):
    """A hostile tenant string (Basic Auth username or X-Scope-OrgID) must
    not escape the spool: '../..'-style and absolute-path tenants get a
    400 and nothing is written outside the spool root."""
    import base64
    import urllib.error
    import urllib.request

    from prometheus_pulsar_remote_write_spark.sources import prompb, snappy_codec
    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        RemoteWriteListener,
        tenant_is_safe,
    )

    assert tenant_is_safe("tenant-a") and tenant_is_safe("T_1.x")
    for bad in ("../../x", "a/b", "a\\b", "..", ".", "/abs", "", "x" * 129):
        assert not tenant_is_safe(bad)

    spool = tmp_path / "nested" / "spool"
    outside = tmp_path / "nested" / "escaped"
    listener = RemoteWriteListener(str(spool))
    host, port = listener.start()
    body = snappy_codec.compress(
        prompb.encode_write_request(
            {
                "timeseries": [
                    {
                        "labels": [{"name": "__name__", "value": "m"}],
                        "samples": [{"value": 1.0, "timestamp": 1}],
                    }
                ]
            }
        )
    )

    def post(headers):
        r = urllib.request.Request(
            f"http://{host}:{port}/write", data=body, headers=headers
        )
        try:
            return urllib.request.urlopen(r).status
        except urllib.error.HTTPError as e:
            return e.code

    assert post({"X-Scope-OrgID": "../escaped"}) == 400
    assert post({"X-Scope-OrgID": "/tmp/escaped"}) == 400
    assert (
        post(
            {"Authorization": "Basic " + base64.b64encode(b"../escaped:pw").decode()}
        )
        == 400
    )
    assert post({"X-Scope-OrgID": "tenant-ok"}) == 200
    listener.stop()

    assert not outside.exists()
    assert listener.rejected == 3 and listener.accepted == 1
    assert (spool / "tenant-ok").is_dir()


def test_http_listener_ops_endpoints(tmp_path):
    """A7 web/ops surface: GET /ready answers 200, GET /metrics serves a
    promlint-clean Prometheus exposition of the ingest counters (and the
    delivery families when a DeliveryMetrics is attached)."""
    import urllib.request

    from prometheus_pulsar_remote_write_spark.operators.metrics import (
        DeliveryMetrics,
        lint_exposition,
    )
    from prometheus_pulsar_remote_write_spark.sources import prompb, snappy_codec
    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        RemoteWriteListener,
    )

    dm = DeliveryMetrics()
    dm.count_sent("tenant-a", 4)
    listener = RemoteWriteListener(str(tmp_path / "spool"), delivery_metrics=dm)
    host, port = listener.start()

    body = snappy_codec.compress(
        prompb.encode_write_request(
            {
                "timeseries": [
                    {
                        "labels": [{"name": "__name__", "value": "m"}],
                        "samples": [{"value": 1.0, "timestamp": 1}],
                    }
                ]
            }
        )
    )
    req = urllib.request.Request(
        f"http://{host}:{port}/write",
        data=body,
        headers={"X-Scope-OrgID": "tenant-a"},
    )
    assert urllib.request.urlopen(req).status == 200

    assert urllib.request.urlopen(f"http://{host}:{port}/ready").read() == b"ready\n"
    resp = urllib.request.urlopen(f"http://{host}:{port}/metrics")
    assert resp.headers["Content-Type"].startswith("text/plain")
    text = resp.read().decode()
    listener.stop()

    assert 'listener_accepted_requests_total{tenant="tenant-a"} 1' in text
    assert "listener_rejected_requests_total 0" in text
    assert 'sent_samples_total{remote="remote",tenant="tenant-a"} 4' in text
    assert (
        lint_exposition(
            text,
            names=[
                "listener_accepted_requests_total",
                "listener_rejected_requests_total",
                "sent_samples_total",
            ],
        )
        == []
    )


def test_max_connection_age_header_decision():
    """Pure middleware decision, the reference's fake-Clock scenarios
    verbatim (pkg/context/handlers_test.go:15-73): at connection start ->
    no header; +0.5s of a 1s cap -> no header; +1.001s -> Connection:
    close. Exactly-at-the-limit does not close (strictly-greater, like
    Go's time.After)."""
    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        max_connection_age_headers,
    )

    t1 = 1577873472.0
    assert max_connection_age_headers(t1, t1, 1.0) == []
    assert max_connection_age_headers(t1, t1 + 0.5, 1.0) == []
    assert max_connection_age_headers(t1, t1 + 1.0, 1.0) == []
    assert max_connection_age_headers(t1, t1 + 1.001, 1.0) == [
        ("Connection", "close")
    ]
    # unset cap: never closes (reference Default("0s") -> disabled)
    assert max_connection_age_headers(t1, t1 + 9999.0, None) == []


def test_max_connection_age_live_keepalive(tmp_path):
    """End-to-end over one kept-alive socket with an injected fake
    clock: requests inside the age window keep the connection open; the
    first response past the cap carries Connection: close and the server
    actually closes (reference pkg/app/server.go:58-66 LB-rebalance
    behavior)."""
    import http.client

    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        RemoteWriteListener,
    )

    class FakeClock:
        def __init__(self, t):
            self.t = t

        def now(self):
            return self.t

    clk = FakeClock(1000.0)
    listener = RemoteWriteListener(
        str(tmp_path / "spool"), max_connection_age=1.0, clock=clk
    )
    host, port = listener.start()
    try:
        conn = http.client.HTTPConnection(host, port)
        conn.request("GET", "/ready")
        r1 = conn.getresponse()
        r1.read()
        assert r1.status == 200
        assert r1.getheader("Connection") is None

        clk.t = 1000.5  # inside the window: connection stays open
        conn.request("GET", "/ready")
        r2 = conn.getresponse()
        r2.read()
        assert r2.status == 200
        assert r2.getheader("Connection") is None

        clk.t = 1001.001  # past the cap: close and actually disconnect
        conn.request("GET", "/ready")
        r3 = conn.getresponse()
        r3.read()
        assert r3.status == 200
        assert r3.getheader("Connection") == "close"

        # a NEW connection gets a fresh start time from the same clock
        conn2 = http.client.HTTPConnection(host, port)
        conn2.request("GET", "/ready")
        r4 = conn2.getresponse()
        r4.read()
        assert r4.status == 200
        assert r4.getheader("Connection") is None
        conn2.close()
        conn.close()
    finally:
        listener.stop()


def test_telemetry_path_flag(tmp_path):
    """--web.telemetry-path relocates the metrics exposition (reference
    app.go:64-65): the configured path serves it, /metrics 404s."""
    import urllib.error
    import urllib.request

    from prometheus_pulsar_remote_write_spark.app import parse_args
    from prometheus_pulsar_remote_write_spark.sources.http_listener import (
        RemoteWriteListener,
    )

    cfg = parse_args(
        [
            "produce",
            f"--pulsar.topic={tmp_path}/bus",
            f"--web.write-path={tmp_path}/drop",
            "--web.telemetry-path=/internal/telemetry",
        ]
    )
    assert cfg.telemetry_path == "/internal/telemetry"
    listener = RemoteWriteListener(
        str(tmp_path / "spool"), telemetry_path=cfg.telemetry_path
    )
    host, port = listener.start()
    try:
        body = urllib.request.urlopen(
            f"http://{host}:{port}/internal/telemetry"
        ).read()
        assert b"listener_rejected_requests_total" in body
        try:
            urllib.request.urlopen(f"http://{host}:{port}/metrics")
            raise AssertionError("default path should 404 when relocated")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        listener.stop()
