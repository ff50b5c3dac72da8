"""Extended pw.io connector tests — the in-container-functional paths
(duckdb, http, null sink, debezium envelope parse) plus gating behavior."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

import pathway_spark as pw


def test_duckdb_roundtrip(spark, tmp_path):
    db = str(tmp_path / "t.duckdb")
    t = pw.debug.table_from_markdown(
        """
        a | b
        1 | x
        2 | y
        """
    )
    pw.io.duckdb.write(t, db, "tbl")
    back = pw.io.duckdb.read("SELECT a, b FROM tbl ORDER BY a", database=db,
                             spark=spark)
    rows = [(r.a, r.b) for r in back.to_df().collect()]
    assert rows == [(1, "x"), (2, "y")]
    pw.io.duckdb.write(t, db, "tbl", mode="insert")
    n = pw.io.duckdb.read("SELECT count(*) AS n FROM tbl", database=db,
                          spark=spark).to_df().collect()[0].n
    assert n == 4


class _Handler(http.server.BaseHTTPRequestHandler):
    received: list = []

    def do_GET(self):
        body = json.dumps([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body.encode())

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        _Handler.received.append(json.loads(self.rfile.read(n)))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def http_srv():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_read(spark, http_srv):
    t = pw.io.http.read(http_srv + "/items", format="json", spark=spark)
    rows = sorted((r.id, r.name) for r in t.to_df().collect())
    assert rows == [(1, "a"), (2, "b")]


def test_http_write(spark, http_srv):
    _Handler.received.clear()
    t = pw.debug.table_from_markdown(
        """
        id | v
        7  | q
        """
    )
    pw.io.http.write(t, http_srv + "/sink")
    assert _Handler.received == [{"id": 7, "v": "q"}]


def test_null_sink_materializes(spark):
    t = pw.debug.table_from_markdown(
        """
        x
        1
        2
        """
    )
    assert pw.io.null.write(t) is None  # executes the plan, writes nothing


def test_debezium_parse(spark):
    from pathway_spark.io.connectors import parse_debezium

    envelope = {
        "payload": {
            "op": "c",
            "before": None,
            "after": {"id": 5, "name": "n"},
            "ts_ms": 1700000000000,
        }
    }
    delete = {
        "payload": {"op": "d", "before": {"id": 5}, "after": None,
                    "ts_ms": 1700000000001}
    }
    df = spark.createDataFrame(
        [(json.dumps(envelope),), (json.dumps(delete),)], ["value"]
    )
    out = {r.op: r for r in parse_debezium(df).collect()}
    assert out["c"]._pw_diff == 1 and out["d"]._pw_diff == -1
    assert json.loads(out["c"].after) == {"id": 5, "name": "n"}
    assert out["d"].ts_ms == 1700000000001


def test_gated_connectors_raise_clearly():
    with pytest.raises(NotImplementedError, match="NATS"):
        pw.io.nats.read()
    with pytest.raises(NotImplementedError, match="Airbyte"):
        pw.io.airbyte.read()
    with pytest.raises(NotImplementedError, match="Chroma"):
        pw.io.chroma.write(None)


def test_s3_path_normalization():
    # code path is real; jar is absent locally — the failure must come from
    # hadoop's s3a loader, proving the URI + conf wiring ran.
    with pytest.raises(Exception) as ei:
        pw.io.s3.read(
            "bucket/key.csv",
            aws_credentials=pw.io.s3.AwsCredentials("ak", "sk", endpoint="http://localhost:9"),
        )
    assert "s3a" in str(ei.value).lower() or "S3A" in str(ei.value)
