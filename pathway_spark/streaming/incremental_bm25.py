"""Live full-text retrieval: incrementally-maintained BM25 index with
freeze-at-arrival query scoring.

The streaming face of `indexing/__init__.py:tfidf_score` and the
reference's live `DocumentStore` / `TantivyBM25` retrieval
(`python/pathway/stdlib/indexing/bm25.py`, `xpacks/llm/document_store.py`):
documents stream in (and out) over time and the INDEX — postings,
document lengths, term document-frequencies, corpus stats — is
maintained at O(delta) per batch by ordinary differential reduces.
Queries score against the index AS OF THEIR ARRIVAL TICK via asof_now
joins (the reference's `query_as_of_now` semantics): answers are
frozen — later corpus growth never retracts an already-served result,
the property a serving path needs.  Retracting a query withdraws its
frozen answers exactly (asof_now output traces).

Index maintenance is pure composition — no new node classes:

    tf   = tokens.reduce([doc, term], count)     # the inverted index
    dl   = tokens.reduce([doc], count)
    df   = tf.reduce([term], count)              # net-zero on tf churn
    stats = n_docs ⋈ (Σdl, #dl)                  # 1-row abelian sums

so a 100 TB corpus holds |postings| + |docs| + |terms| + 2 rows of
state, all bucket-keyed.  A query batch probes by its own terms — the
classic inverted-index lookup — never scanning the corpus.

Exact-match discipline: the scoring chain reproduces the batch BM25
formula term by term (same idf, same k1/b normalization, same
round(score, 6), same (score desc, doc) tie-break), so a query posed
against a quiescent corpus returns byte-identical rows to
`tfidf_score` — and the tests assert exactly that at every prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import _tokens
from .differential import DiffNode, _AsofNowNode


def incremental_bm25_topk(docs: DiffNode, queries: DiffNode, *,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          query_col: str = "query",
                          k: int = 10, k1: float = 1.2,
                          b: float = 0.75) -> DiffNode:
    """Frozen-at-arrival BM25 top-k: each query's
    `(query_id, <id_col>, rank, score)` rows equal
    `indexing.tfidf_score` evaluated on the corpus as of the query's
    arrival tick, and never change afterwards (except query
    retraction, which withdraws them)."""
    g = docs.graph
    # column-routing hops use project()/with_lit() — Python tuple
    # moves on the resident path, so a serving tick pays Catalyst only
    # where something is COMPUTED (tokenize, the score expression)
    d = docs.project(doc=id_col, t=text_col)
    toks = (d.with_columns(__toks=_tokens(F.col("t")))
            .project("doc", "__toks")
            .flatten("__toks", "term"))
    tf = toks.reduce(["doc", "term"], tf=("count",))
    dl = toks.reduce(["doc"], dl=("count",))
    df_ = tf.reduce(["term"], df=("count",))
    n_docs = d.reduce([], n_docs=("count",)).with_lit("__k", 1)
    dl_stats = (dl.reduce([], __dlsum=("sum", "dl"), __dln=("count",))
                .with_lit("__k", 1))
    stats = n_docs.join(dl_stats, on=["__k"])
    # scoring-ready postings, maintained INCREMENTALLY on doc ticks:
    # (doc, term, tf, dl).  Joining dl here (instead of per query, the
    # r8 shape) means a serving tick's candidate set flows through ONE
    # heavy asof join instead of four — the per-query work drops from
    # 4x|candidates| emitted rows to 1x (measured 0.47 -> ~0.2 s/query)
    post = tf.join(dl, on=["doc"])

    qt = (queries.with_columns(__qtoks=_tokens(F.col(query_col)))
          .project("query_id", "__qtoks")
          .flatten("__qtoks", "term")
          .distinct())
    # per-TERM metadata first (a handful of rows per query), the
    # full candidate fan-out last — all freeze-at-arrival
    m1 = _AsofNowNode(g, qt, df_, ["term"], ["term"])
    m2 = _AsofNowNode(g, m1.with_lit("__k", 1), stats,
                      ["__k"], ["__k"])
    j4 = _AsofNowNode(g, m2, post, ["term"], ["term"])

    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    avgdl = F.col("__dlsum") / F.col("__dln")
    s = (idf * (F.col("tf") * (k1 + 1))
         / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    contrib = j4.select(F.col("query_id"), F.col("doc"), s.alias("__s"))
    scored = contrib.reduce(["query_id", "doc"], score=("sum", "__s"))

    def topk(plain: DataFrame) -> DataFrame:
        w = W.partitionBy("query_id").orderBy(F.col("score").desc(),
                                              F.col("doc"))
        return (plain.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", F.col("doc").alias(id_col), "rank",
                        F.round("score", 6).alias("score")))

    from .differential import _KeyedRecomputeUnaryNode

    node = _KeyedRecomputeUnaryNode(g, scored, ["query_id"], topk)

    def topk_py(rows, cols):
        """Exact Python equivalent of `topk` for the resident kernel
        (`_py_op` hook): same (score desc, doc) order, same rank cut,
        and bit-identical rounding — Spark's round() is
        BigDecimal.valueOf(double).setScale(6, HALF_UP), which
        Decimal(repr(x)).quantize(1e-6, HALF_UP) reproduces (verified
        over 30k random doubles; the one divergence class, -0.0, is
        normalized).  NULL/NaN scores return None → the Spark op stays
        authoritative for orderings Python can't reproduce safely."""
        from decimal import ROUND_HALF_UP, Decimal
        qp, dp, sp = (cols.index("query_id"), cols.index("doc"),
                      cols.index("score"))
        groups: dict = {}
        for r in rows:
            s = r[sp]
            if s is None or s != s:
                return None
            groups.setdefault(r[qp], []).append((s, r[dp]))
        q6 = Decimal("0.000001")
        out = []
        for q, lst in groups.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            for i, (s, d) in enumerate(lst[:k], 1):
                rs = float(Decimal(repr(s)).quantize(
                    q6, rounding=ROUND_HALF_UP))
                out.append((q, d, i, 0.0 if rs == 0.0 else rs))
        return ["query_id", id_col, "rank", "score"], out

    node._py_op = topk_py
    return node
