"""pw.xpacks.llm pipeline tests — every stage runs offline via the
deterministic variants; full RAG composition end-to-end on the driver's
documents table."""

from __future__ import annotations

import pytest

import pathway_spark as pw
from pathway_spark.xpacks.llm import (
    embedders,
    llms,
    parsers,
    question_answering,
    rerankers,
    splitters,
    vector_store,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return pw.io.parquet.read(f"{SF}/documents.parquet", spark=spark)


def test_hash_embedder_deterministic(spark, docs):
    emb = embedders.DeterministicHashEmbedder(dimensions=16)
    assert emb.get_embedding_dimension() == 16
    t = docs.select(docs.doc_id, e=emb(docs.text))
    rows = t.to_df().limit(5).collect()
    assert all(len(r.e) == 16 for r in rows)
    # unit-norm and stable across runs
    import math

    n = math.sqrt(sum(x * x for x in rows[0].e))
    assert abs(n - 1.0) < 1e-6
    again = t.to_df().limit(5).collect()
    assert [r.e for r in rows] == [r.e for r in again]


def test_gated_embedder_raises():
    with pytest.raises(ImportError, match="openai"):
        embedders.OpenAIEmbedder()
    with pytest.raises(ImportError, match="EchoChat"):
        llms.OpenAIChat()
    with pytest.raises(ImportError):
        rerankers.CrossEncoderReranker()
    # PypdfParser is no longer gated: it falls back to the stdlib
    # extractor (tests/test_pdf_parser.py) when pypdf is absent.


def test_utf8_parser(spark):
    p = parsers.Utf8Parser()
    t = pw.debug.table_from_pandas(
        __import__("pandas").DataFrame({"data": [b"hello", "d\xc3\xa9j\xc3\xa0".encode("latin-1")]})
    )
    out = t.select(txt=p(t.data)).to_df().collect()
    assert out[0].txt == "hello" or out[1].txt == "hello"


def test_echo_chat_and_prompt(spark):
    chat = llms.EchoChat(prefix="A: ")
    q = llms.prompt_chat_single_qa("what is 2+2?")
    assert q.value[0]["content"] == "what is 2+2?"
    t = pw.debug.table_from_pandas(
        __import__("pandas").DataFrame({"prompt": ["hi there"]})
    )
    out = t.select(ans=chat(t.prompt)).to_df().collect()
    assert out[0].ans == "A: hi there"


def test_rerank_topk_filter(spark):
    import pandas as pd

    t = pw.debug.table_from_pandas(pd.DataFrame({
        "query_id": [1, 1, 1, 2, 2],
        "score": [0.9, 0.5, 0.7, 0.3, 0.8],
        "doc": list("abcde"),
    }))
    out = rerankers.rerank_topk_filter(t, k=2)
    kept = sorted((r.query_id, r.doc) for r in out.to_df().collect())
    assert kept == [(1, "a"), (1, "c"), (2, "d"), (2, "e")]


def test_llm_reranker_scores(spark):
    import pandas as pd

    # fake chat scoring by doc content: returns "5" for relevant
    class FakeScorer(llms.BaseChat):
        def __init__(self):
            super().__init__(lambda prompt: "5" if "spark" in prompt else "1")

    rr = rerankers.LLMReranker(FakeScorer())
    t = pw.debug.table_from_pandas(pd.DataFrame({
        "query": ["engines", "engines"],
        "chunk_text": ["spark engine", "cooking pasta"],
    }))
    out = {r.chunk_text: r.score for r in rr(t).to_df().collect()}
    assert out["spark engine"] == 5.0 and out["cooking pasta"] == 1.0


def test_recursive_and_null_splitters(spark):
    import pandas as pd

    t = pw.debug.table_from_pandas(pd.DataFrame({
        "doc_id": [1],
        "text": ["para one is here.\n\npara two is a bit longer than one."
                 "\n\npara three."],
    }))
    n = splitters.NullSplitter()(t)
    assert n.to_df().count() == 1
    r = splitters.RecursiveSplitter(chunk_size=30)(t)
    rows = r.to_df().orderBy("chunk_pos").collect()
    assert len(rows) >= 2
    joined = "\n\n".join(x.chunk_text for x in rows)
    assert "para three." in joined and "para one" in joined


def test_vector_store_retrieval(spark, docs):
    vs = vector_store.VectorStore(
        docs, embedder=embedders.DeterministicHashEmbedder(dimensions=32))
    sample = docs.to_df().limit(1).collect()[0]
    # query with a doc's own text → that doc must be the top hit
    hits = vs.retrieve_dicts([sample.text], k=3, spark=spark)
    assert hits[0][0]["doc_id"] == sample.doc_id
    with pytest.raises(NotImplementedError):
        vector_store.VectorStoreServer(docs).run_server()


def test_rag_question_answering(spark, docs):
    store = pw.xpacks.llm.DocumentStore(docs)
    chat = llms.EchoChat()
    qa = question_answering.BaseRAGQuestionAnswerer(
        chat, store, search_topk=2,
        prompt_template="CTX[{context}] Q[{query}]")
    import pandas as pd

    queries = pw.debug.table_from_pandas(
        pd.DataFrame({"query": ["the first document text sample"]}))
    out = qa.answer_query(queries).to_df().collect()
    assert len(out) == 1
    assert out[0].answer.startswith("CTX[")
    assert "Q[the first document text sample]" in out[0].answer


def test_vector_store_plan_quality(spark, docs):
    """Retrieval must stay JVM-side except the Arrow-batched embedder:
    no row-at-a-time BatchEvalPython anywhere in the plan."""
    from pathway_spark.plans import plan_text

    vs = vector_store.VectorStore(
        docs, embedder=embedders.DeterministicHashEmbedder(dimensions=16))
    import pandas as pd

    qt = pw.debug.table_from_pandas(pd.DataFrame({"query": ["x y z"]}))
    hits = vs.retrieve(qt, k=2)
    txt = plan_text(hits.to_df())
    assert "BatchEvalPython" not in txt
    # the only Python in the plan is the Arrow-batched embedder UDF
    assert "ArrowEvalPython" in txt


# ---------------------------------------------------------------------------
# OpenAI-compatible REST transport (no client package) — offline fixture
# ---------------------------------------------------------------------------

import threading as _threading
from http.server import BaseHTTPRequestHandler as _BaseHandler
from http.server import ThreadingHTTPServer as _ThreadingServer


@pytest.fixture()
def openai_fixture():
    """Minimal OpenAI-compatible server: /embeddings returns a vector
    derived from input length; /chat/completions upcases the last user
    message. Records every (path, body, auth) for payload asserts.
    First embeddings call returns 500 to exercise the retry path."""
    import json as _json

    calls = []
    fail_once = {"n": 1}
    lock = _threading.Lock()

    class Handler(_BaseHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = _json.loads(self.rfile.read(length))
            with lock:
                calls.append((self.path, body,
                              self.headers.get("Authorization")))
            if self.path.endswith("/embeddings") and fail_once["n"] > 0:
                fail_once["n"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            if self.path.endswith("/embeddings"):
                text = body["input"][0]
                vec = [float(len(text)), 1.0, 0.0]
                out = {"data": [{"embedding": vec}]}
            else:
                msg = body["messages"][-1]["content"]
                out = {"choices": [{"message": {"content": msg.upper()}}]}
            data = _json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = _ThreadingServer(("127.0.0.1", 0), Handler)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/v1", calls
    finally:
        srv.shutdown()


def test_openai_compatible_embedder_rest_protocol(spark, openai_fixture):
    base, calls = openai_fixture
    from pathway_spark.xpacks.llm.embedders import OpenAICompatibleEmbedder

    emb = OpenAICompatibleEmbedder(base_url=base, api_key="sk-test",
                                   model="text-embedding-3-small")
    t = pw.debug.table_from_rows(
        pw.schema_from_types(txt=str), [("hello",), ("hi",)], spark=spark)
    out = t.select(v=emb(pw.this.txt))
    rows = {tuple(r)[0][0] for r in out.to_df().select("v").collect()}
    assert rows == {5.0, 2.0}  # len("hello"), len("hi")
    emb_calls = [c for c in calls if c[0].endswith("/embeddings")]
    # retry happened: >= 3 calls for 2 rows (first returned 500)
    assert len(emb_calls) >= 3
    path, body, auth = emb_calls[-1]
    assert body["model"] == "text-embedding-3-small"
    assert isinstance(body["input"], list)
    assert auth == "Bearer sk-test"


def test_openai_compatible_chat_rest_protocol(spark, openai_fixture):
    base, calls = openai_fixture
    import json as _json

    from pathway_spark.xpacks.llm.llms import OpenAICompatibleChat

    chat = OpenAICompatibleChat(base_url=base, api_key="sk-test",
                                model="gpt-4o-mini", temperature=0.2)
    t = pw.debug.table_from_rows(
        pw.schema_from_types(q=str), [("what is pathway",)], spark=spark)
    prompts = t.select(p=pw.apply(lambda q: _json.dumps(
        [{"role": "user", "content": q}]), pw.this.q))
    out = prompts.select(a=chat(pw.this.p))
    got = [r[0] for r in out.to_df().select("a").collect()]
    assert got == ["WHAT IS PATHWAY"]
    chat_calls = [c for c in calls if c[0].endswith("/chat/completions")]
    assert chat_calls and chat_calls[-1][1]["temperature"] == 0.2
    assert chat_calls[-1][1]["messages"][-1]["role"] == "user"


def test_llm_review_regressions(spark, openai_fixture):
    """Round-4 review fixes: retry_strategy wires into the async
    executor (not silently dropped), positional model names bind,
    UDF options never leak into HTTP payloads, empty text embeds to a
    unit vector, and empty message lists don't kill the batch."""
    import math

    from pathway_spark.udfs import AsyncExecutor, FixedDelayRetryStrategy
    from pathway_spark.xpacks.llm.embedders import (
        DeterministicHashEmbedder, OpenAICompatibleEmbedder, _hash_embed)
    from pathway_spark.xpacks.llm.llms import EchoChat, OpenAICompatibleChat

    base, calls = openai_fixture
    rs = FixedDelayRetryStrategy()
    emb = OpenAICompatibleEmbedder(base_url=base, retry_strategy=rs)
    assert isinstance(emb._executor, AsyncExecutor)
    assert emb._executor.retry_strategy is rs

    chat = OpenAICompatibleChat(base_url=base, retry_strategy=rs,
                                deterministic=True, temperature=0.1)
    assert isinstance(chat._executor, AsyncExecutor)
    # deterministic is a UDF option, NOT a generation kwarg
    assert chat.generation_kwargs == {"temperature": 0.1}
    assert chat._complete('[{"role": "user", "content": "hi"}]') == "HI"
    assert chat._complete("[]") == ""          # empty messages: no crash

    vec = _hash_embed("   ", 8)
    assert abs(math.sqrt(sum(x * x for x in vec)) - 1.0) < 1e-12

    echo = EchoChat(prefix="p:")
    assert echo._fn("[]") == "p:"

    # positional model binds (was silently dropped for gated embedders)
    import pytest as _pytest
    from pathway_spark.xpacks.llm.embedders import OpenAIEmbedder
    with _pytest.raises(ImportError):
        OpenAIEmbedder("text-embedding-3-large")   # pkg gated, but the
        # signature accepts the positional model (no silent *args drop)
