"""Vector-store sinks against a local ephemeral HTTP fixture: the full
Spark path runs (foreachPartition on executors → batched REST upserts),
and the fixture records every request so payload shapes are asserted
exactly. Reference: python/pathway/io/pinecone/__init__.py."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

import pathway_spark as pw
from pathway_spark.table import Table


@pytest.fixture()
def capture_server():
    """Local HTTP server recording (method, path, body-json) requests."""
    requests: list[tuple[str, str, dict]] = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length)) if length else {}
            with lock:
                requests.append((self.command, self.path, body))
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b"{}")

        do_POST = _handle
        do_PUT = _handle

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", requests
    finally:
        srv.shutdown()


def _vec_table(spark, n=7) -> Table:
    rows = [(i, [float(i), float(i) + 0.5], f"doc {i}") for i in range(n)]
    df = spark.createDataFrame(rows, "id long, vector array<double>, text string")
    return Table.from_spark(df.coalesce(2), id_columns=["id"])


def test_pinecone_upsert_payloads(spark, capture_server):
    url, requests = capture_server
    t = _vec_table(spark)
    pw.io.pinecone.write(t, api_key="k", index_host=url, namespace="ns",
                         batch_size=3)
    assert requests, "no upsert requests arrived"
    vecs = [v for _, _, b in requests for v in b["vectors"]]
    assert len(vecs) == 7
    assert all(p == "/vectors/upsert" for _, p, _ in requests)
    assert all(b.get("namespace") == "ns" for _, _, b in requests)
    by_id = {v["id"]: v for v in vecs}
    assert by_id["3"]["values"] == [3.0, 3.5]
    assert by_id["3"]["metadata"]["text"] == "doc 3"
    # batch_size respected (≤3 vectors per request)
    assert max(len(b["vectors"]) for _, _, b in requests) <= 3


def test_qdrant_upsert_payloads(spark, capture_server):
    url, requests = capture_server
    t = _vec_table(spark, n=4)
    pw.io.qdrant.write(t, url=url, collection="c1", batch_size=10)
    pts = [p for _, _, b in requests for p in b["points"]]
    assert len(pts) == 4
    meth, path, _ = requests[0]
    assert meth == "PUT" and path == "/collections/c1/points?wait=true"
    by_id = {p["id"]: p for p in pts}
    assert by_id[2]["vector"] == [2.0, 2.5]
    assert by_id[2]["payload"]["text"] == "doc 2"


def test_milvus_weaviate_chroma_payloads(spark, capture_server):
    url, requests = capture_server
    t = _vec_table(spark, n=3)
    pw.io.milvus.write(t, url=url, collection="m1")
    pw.io.weaviate.write(t, url=url, class_name="Doc")
    pw.io.chroma.write(t, url=url, collection_id="cc", document_col="text")

    milvus = [b for _, p, b in requests if p.endswith("/entities/insert")]
    assert sum(len(b["data"]) for b in milvus) == 3
    assert milvus[0]["collectionName"] == "m1"
    assert {"id", "vector", "text"} <= set(milvus[0]["data"][0])

    weav = [b for _, p, b in requests if p == "/v1/batch/objects"]
    objs = [o for b in weav for o in b["objects"]]
    assert len(objs) == 3 and objs[0]["class"] == "Doc"
    assert "vector" in objs[0] and "text" in objs[0]["properties"]

    chroma = [b for _, p, b in requests
              if p == "/api/v1/collections/cc/upsert"]
    ids = [i for b in chroma for i in b["ids"]]
    assert sorted(ids) == ["0", "1", "2"]
    assert all(len(b["ids"]) == len(b["embeddings"]) == len(b["documents"])
               for b in chroma)


def test_streaming_upsert(spark, tmp_path, capture_server):
    """foreachBatch path: a file-streamed table upserts per micro-batch."""
    url, requests = capture_server
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"id": i, "vector": [float(i)], "text": f"d{i}"})
                  for i in range(5)))
    sdf = (spark.readStream.schema("id long, vector array<double>, text string")
           .json(str(src)))
    q = pw.io.qdrant.write(Table(sdf), url=url, collection="s1", batch_size=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pts = [p for _, _, b in requests for p in b["points"]]
    assert sorted(p["id"] for p in pts) == [0, 1, 2, 3, 4]
    assert max(len(b["points"]) for _, _, b in requests) <= 2


def test_retry_then_raise(spark):
    """Transport errors retry with backoff, then surface."""
    from pathway_spark.io.vector_store import _post_with_retry

    calls = []

    def flaky(url, method, headers, body):
        calls.append(1)
        if len(calls) < 3:
            raise OSError("boom")
        return 200

    _post_with_retry("http://x/", "POST", {}, {"a": 1}, max_retries=3,
                     transport=flaky)
    assert len(calls) == 3

    calls.clear()

    def dead(url, method, headers, body):
        calls.append(1)
        raise OSError("down")

    with pytest.raises(OSError):
        _post_with_retry("http://x/", "POST", {}, {}, max_retries=2,
                         transport=dead)
    assert len(calls) == 3


def test_leann_write_with_injected_builder(spark, tmp_path):
    """leann sink (reference io/leann _LeannObserver): skip empty text,
    add_text per doc, one build_index at end-of-input."""
    import pandas as pd

    import pathway_spark as pw

    built = {}

    class FakeBuilder:
        def __init__(self, **kwargs):
            built["kwargs"] = kwargs
            self.docs = []

        def add_text(self, text, metadata):
            self.docs.append((text, metadata))

        def build_index(self, path):
            built["path"] = path
            built["docs"] = list(self.docs)

    t = pw.debug.table_from_pandas(pd.DataFrame({
        "text": ["alpha doc", "", "   ", "beta doc"],
        "lang": ["en", "en", "de", "fr"],
    }))
    idx = str(tmp_path / "idx" / "docs.leann")
    n = pw.io.leann.write(t, index_path=idx, text_col="text",
                          metadata_cols=["lang"],
                          builder_factory=FakeBuilder)
    assert n == 2
    assert built["path"] == idx
    assert sorted(d[0] for d in built["docs"]) == ["alpha doc", "beta doc"]
    assert {d[1]["lang"] for d in built["docs"]} == {"en", "fr"}
    assert built["kwargs"] == {"backend_name": "hnsw"}

    with pytest.raises(NotImplementedError, match="leann"):
        pw.io.leann.write(t, index_path=idx)
