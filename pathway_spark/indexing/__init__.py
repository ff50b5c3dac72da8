"""Indexes / retrieval — reference `python/pathway/stdlib/indexing/`
(BruteForceKnn nearest_neighbors.py:170, LshKnn 262, bm25.py, data_index.py).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, ivf_topk
from ..table import ID, Table


class BruteForceKnnFactory:
    """nearest_neighbors.py:170 — exact KNN."""

    def __init__(self, *, dimensions: int | None = None, metric: str = "cosine", **kw):
        self.metric = metric

    def query(self, corpus: Table, queries: Table, *, vec_col="embedding",
              id_col="vec_id", k=10) -> Table:
        return brute_force_topk(corpus, queries, vec_col=vec_col, id_col=id_col,
                                k=k, metric=self.metric)


class UsearchKnnFactory:
    """nearest_neighbors.py:65 — HNSW ANN (usearch in the reference;
    self-contained per-partition numpy HNSW here, see operators/hnsw.py)."""

    def __init__(self, *, dimensions: int | None = None, metric: str = "cosine",
                 connectivity: int = 16, expansion_add: int = 64,
                 expansion_search: int = 64, **kw):
        self.metric = metric
        self.m = connectivity or 16
        self.ef_construction = expansion_add or 64
        self.ef_search = expansion_search or 64

    def query(self, corpus: Table, queries: Table, *, vec_col="embedding",
              id_col="vec_id", k=10) -> Table:
        from ..operators.hnsw import hnsw_topk

        return hnsw_topk(corpus, queries, vec_col=vec_col, id_col=id_col, k=k,
                         metric=self.metric, m=self.m,
                         ef_construction=self.ef_construction,
                         ef_search=self.ef_search)

    def query_distributed(self, corpus: Table, queries: Table, *,
                          vec_col="embedding", id_col="vec_id", k=10,
                          nlist: int = 16, nprobe: int = 4) -> Table:
        """Both-sides-distributed variant (round 7): IVF coarse cells +
        one executor-side HNSW graph per cell — for query sets too
        large to broadcast.  See `operators/hnsw.py:ivf_hnsw_topk`."""
        from ..operators.hnsw import ivf_hnsw_topk

        return ivf_hnsw_topk(corpus, queries, vec_col=vec_col,
                             id_col=id_col, k=k, metric=self.metric,
                             nlist=nlist, nprobe=nprobe, m=self.m,
                             ef_construction=self.ef_construction,
                             ef_search=self.ef_search)


class LshKnnFactory:
    """nearest_neighbors.py:262 — approximate KNN (IVF-style cells here:
    better recall/cost control than bit-sampling LSH on dense vectors)."""

    def __init__(self, *, dimensions: int | None = None, n_or=4, n_and=16, **kw):
        self.nprobe = n_or
        self.nlist = n_and

    def query(self, corpus: Table, queries: Table, *, vec_col="embedding",
              id_col="vec_id", k=10) -> Table:
        return ivf_topk(corpus, queries, vec_col=vec_col, id_col=id_col, k=k,
                        nlist=self.nlist, nprobe=self.nprobe)


def tfidf_score(docs: Table, queries: Table, *, text_col="text", id_col="doc_id",
                query_col="query", k: int = 10, k1: float = 1.2, b: float = 0.75) -> Table:
    """BM25 retrieval (reference bm25.py / tantivy integration) as
    DataFrame aggs: docfreq join + per-(query,doc) score + top-k window.

    Scale: postings = explode(tokens) — shuffles on term; the classic
    inverted-index join. No python UDFs."""
    from ..operators.dedup import _tokens

    d = docs._df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))
    # dl (BM25 document length) == the token-occurrence count == the SIZE
    # of the token array: attach it at tokenize time, so no separate
    # per-doc aggregation + doc-keyed join is needed (guide §2.4: one
    # exchange fewer; r11 — the old dl derivation also made every
    # broadcast build depend on the tokenize→tf shuffle, and Spark runs
    # broadcast builds as concurrent jobs that RACED to materialize the
    # persisted tf, re-running the tokenize stage 2-3x per invocation)
    # materialize the token array as an ATTRIBUTE first: with
    # `size(_tokens(t))` and `explode(_tokens(t))` in ONE projection,
    # the post-Generate projection re-evaluates the split per exploded
    # token (r11 measured 3.3 s vs 0.27 s for the explode alone at
    # sf0.1 — the tf build was ~12x the cost of the tokenize).  With
    # the array behind the Generate, `size` reads the attribute and the
    # split runs once per document; Catalyst cannot collapse the two
    # projections across the Generate.
    toks = d.select("doc", _tokens(F.col("t")).alias("toks")).select(
        "doc",
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    )
    # ONE tokenization pass: tf is the inverted index (now carrying dl);
    # its only consumer is the query-term slice tfq below, which is
    # lazily localCheckpointed — so the tokenize→tf lineage runs exactly
    # once per execution and the FULL-vocabulary tf is never persisted
    # (r12: the old MEMORY_AND_DISK persist wrote the whole inverted
    # index to executor storage per call — cluster-storage pressure at
    # corpus scale — and SQL persists leak across structurally-equal
    # invocations via the CacheManager, the cross-run reuse the bench
    # rules forbid; the live BM25 store keeps its own arrangement in
    # streaming/incremental_bm25.py and never reads this persist)
    tf = toks.groupBy("doc", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    # corpus stats as a broadcast 1-row frame built MAP-ONLY from the raw
    # docs (no tokenize shuffle, no tf dependency): avg(size(tokens)) is
    # exactly avg(dl) — both are exact long sums divided by the count —
    # and NO driver-side actions in the build path (a count() + collect()
    # here would serialize the whole pipeline behind extra jobs at 100 TB)
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        # when(isNotNull): a NULL text produced no exploded rows, so the
        # old avg(dl) skipped it — size(NULL) is -1, so guard explicitly
        F.avg(F.when(F.col("t").isNotNull(),
                     F.size(_tokens(F.col("t"))))).alias("avgdl"),
    )
    qex = queries._df.select(
        F.col("query_id"),
        F.explode(_tokens(F.col(query_col))).alias("term")).distinct()
    qterms = qex.select("term").distinct()
    # docfreq only for the query's terms: filtering tf by term BEFORE the
    # per-term aggregation keeps the per-term counts exact while never
    # aggregating (or shipping) the rest of the vocabulary — at corpus
    # scale the old plan aggregated and broadcast idf for EVERY term
    # (guide §2.3: shuffle fewer bytes; §3.2: pre-filter the big side)
    # tfq — the candidate postings (only the query's terms) — is TINY
    # relative to tf and is read twice (docfreq aggregation + scoring
    # join).  A lazy localCheckpoint materializes the tokenize→tf→filter
    # lineage once per execution and both consumers scan the checkpointed
    # rows (the branches prune different columns, so without it each
    # would recompute the full tokenize+aggregate — the q31 lesson);
    # being an RDD checkpoint it is invisible to the CacheManager, so a
    # fresh invocation recomputes from parquet.
    tfq = tf.join(F.broadcast(qterms), "term").localCheckpoint(eager=False)
    dfq = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # dfq — one row per query term, bounded by the query vocabulary —
    # joins as a BROADCAST now (r12): the r11 objection (a broadcast
    # build was a concurrent job racing to recompute the tokenize→tf
    # lineage) is gone since tfq is checkpointed — the build job
    # materializes the checkpoint once and every other consumer reuses
    # the blocks.  The scored branch then stays map-side from the
    # checkpoint scan to the per-(query, doc) partial aggregate: two
    # exchanges fewer than the shuffle_hash form.
    scored = (
        tfq.join(F.broadcast(qex), "term")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "s",
            F.col("idf") * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc")
        .agg(F.sum("s").alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc"))
    out = (scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
           .select("query_id", F.col("doc").alias(id_col), "rank",
                   F.round("score", 6).alias("score")))
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))


def hybrid_retrieve(docs: Table, queries: Table, *, text_col="text",
                    vec_col="embedding", id_col="doc_id",
                    query_col="query", query_vec_col="embedding",
                    k: int = 10, rrf_k: int = 60) -> Table:
    """Hybrid retrieval (reference `stdlib/indexing/hybrid_index.py`):
    BM25 + vector KNN fused by Reciprocal Rank Fusion —
    score = Σ 1/(rrf_k + rank). Pure DataFrame ops: both retrievals run
    independently and fuse with a full-outer join on (query, doc)."""
    from ..operators.similarity import brute_force_topk

    bm = tfidf_score(docs, queries, text_col=text_col, id_col=id_col,
                     query_col=query_col, k=k)._df.select(
        "query_id", F.col(id_col).alias("doc"), F.col("rank").alias("r_text"))
    kn = brute_force_topk(
        Table(docs._df.select(F.col(id_col).alias("vec_id"), F.col(vec_col))),
        Table(queries._df.select(F.col("query_id").alias("vec_id"),
                                 F.col(query_vec_col))),
        vec_col=vec_col, id_col="vec_id", k=k,
    )._df.select(F.col("query_id"), F.col("neighbor_id").alias("doc"),
                 F.col("rank").alias("r_vec"))
    fused = (
        bm.join(kn, ["query_id", "doc"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_text")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("r_vec")), F.lit(0.0)),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc"))
    out = (fused.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= k)
           .select("query_id", F.col("doc").alias(id_col), "rank", "rrf"))
    return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))


class DataIndex:
    """reference data_index.py:278 — as-of-now retrieval join (batch:
    every query sees the full index)."""

    def __init__(self, data: Table, retriever_factory, *, vec_col="embedding", id_col="vec_id"):
        self._data = data
        self._factory = retriever_factory
        self._vec_col = vec_col
        self._id_col = id_col

    def query(self, queries: Table, *, number_of_matches: int = 3) -> Table:
        return self._factory.query(self._data, queries, vec_col=self._vec_col,
                                   id_col=self._id_col, k=number_of_matches)

    query_as_of_now = query


# ----------------------------------------------------------------- parity
# Class/enum/helper names from the reference `stdlib/indexing/__init__.py`.

import enum as _enum


class BruteForceKnnMetricKind(_enum.Enum):
    """nearest_neighbors.py — metric enum for BruteForceKnn."""
    COS = "cosine"
    L2SQ = "l2"


class USearchMetricKind(_enum.Enum):
    """nearest_neighbors.py:65 — usearch metric enum."""
    COS = "cosine"
    L2SQ = "l2"
    IP = "dot"


def _metric_name(metric) -> str:
    return metric.value if isinstance(metric, _enum.Enum) else str(metric)


class AbstractRetrieverFactory:
    """retrievers.py:7 — builds a bound index over a data table."""

    def build_index(self, data: Table, *, vec_col: str = "embedding",
                    text_col: str = "text", id_col: str = "vec_id"):
        raise NotImplementedError


class InnerIndex:
    """data_index.py:206 — an index bound to its data; `query` answers a
    query table, `query_as_of_now` is the streaming-consistent form (in
    batch plans every query sees the full index, so they coincide)."""

    def __init__(self, data: Table, factory, *, vec_col="embedding",
                 text_col="text", id_col="vec_id"):
        self._data = data
        self._factory = factory
        self._vec_col = vec_col
        self._text_col = text_col
        self._id_col = id_col

    def query(self, queries: Table, *, number_of_matches: int = 3) -> Table:
        return self._factory.query(self._data, queries,
                                   vec_col=self._vec_col,
                                   id_col=self._id_col,
                                   k=number_of_matches)

    query_as_of_now = query


class BruteForceKnn(InnerIndex):
    """nearest_neighbors.py:170 — exact KNN bound to a data table."""


class USearchKnn(InnerIndex):
    """nearest_neighbors.py:65 — HNSW ANN bound to a data table (usearch
    in the reference; the per-partition numpy HNSW of operators/hnsw.py
    here)."""


class LshKnn(InnerIndex):
    """nearest_neighbors.py:262 — approximate KNN (IVF cells here)."""


class TantivyBM25(InnerIndex):
    """bm25.py:41 — full-text BM25 index. The reference embeds the
    tantivy engine; our tfidf_score builds the same inverted-index plan
    in DataFrame ops (one tokenize pass, broadcast idf stats)."""

    def query(self, queries: Table, *, number_of_matches: int = 3) -> Table:
        return tfidf_score(self._data, queries, text_col=self._text_col,
                           id_col=self._id_col, k=number_of_matches)

    query_as_of_now = query


class TantivyBM25Factory(AbstractRetrieverFactory):
    """bm25.py:109."""

    def __init__(self, *, ram_budget: int | None = None,
                 in_memory_index: bool = True, **kw):
        del ram_budget, in_memory_index, kw  # engine knobs; Spark plans need none

    def build_index(self, data: Table, *, vec_col="embedding",
                    text_col="text", id_col="vec_id") -> TantivyBM25:
        return TantivyBM25(data, self, vec_col=vec_col, text_col=text_col,
                           id_col=id_col)

    def query(self, corpus: Table, queries: Table, *, vec_col="embedding",
              id_col="vec_id", k=10, text_col="text") -> Table:
        return tfidf_score(corpus, queries, text_col=text_col,
                           id_col=id_col, k=k)


class DefaultKnnFactory(BruteForceKnnFactory):
    """nearest_neighbors.py:574 — the default dense-vector factory."""


class HybridIndex(InnerIndex):
    """hybrid_index.py:14 — fuse several retrievers by Reciprocal Rank
    Fusion: score = Σ 1/(k + rank) over each retriever's ranking."""

    def __init__(self, retrievers: list, k: int = 60):
        self._retrievers = retrievers
        self._k = k

    def query(self, queries: Table, *, number_of_matches: int = 3) -> Table:
        fused = None
        for i, r in enumerate(self._retrievers):
            part = r.query(queries, number_of_matches=number_of_matches)._df
            id_like = [c for c in part.columns
                       if c not in ("query_id", "rank", "score", "rrf", ID)]
            doc_col = id_like[0] if id_like else "doc_id"
            part = part.select("query_id", F.col(doc_col).alias("doc"),
                               F.col("rank").alias(f"r{i}"))
            fused = part if fused is None else fused.join(
                part, ["query_id", "doc"], "full_outer")
        rrf = None
        for i in range(len(self._retrievers)):
            term = F.coalesce(1.0 / (F.lit(self._k) + F.col(f"r{i}")), F.lit(0.0))
            rrf = term if rrf is None else rrf + term
        fused = fused.withColumn("rrf", rrf)
        w = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc"))
        out = (fused.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= number_of_matches)
               .select("query_id", F.col("doc").alias("doc_id"), "rank", "rrf"))
        return Table(out.withColumn(ID, F.xxhash64("query_id", "rank")))

    query_as_of_now = query


class HybridIndexFactory(AbstractRetrieverFactory):
    """hybrid_index.py:161 — builds a HybridIndex from retriever factories."""

    def __init__(self, retriever_factories: list, k: int = 60):
        self._factories = retriever_factories
        self._k = k

    def build_index(self, data: Table, *, vec_col="embedding",
                    text_col="text", id_col="vec_id") -> HybridIndex:
        return HybridIndex(
            [f.build_index(data, vec_col=vec_col, text_col=text_col,
                           id_col=id_col) for f in self._factories],
            k=self._k)


def _bind(factory_cls):
    """Give the plain KNN factories a build_index for the parity path."""
    def build_index(self, data: Table, *, vec_col="embedding",
                    text_col="text", id_col="vec_id"):
        cls_map = {
            "BruteForceKnnFactory": BruteForceKnn,
            "DefaultKnnFactory": BruteForceKnn,
            "UsearchKnnFactory": USearchKnn,
            "LshKnnFactory": LshKnn,
        }
        icls = cls_map.get(type(self).__name__, BruteForceKnn)
        return icls(data, self, vec_col=vec_col, text_col=text_col,
                    id_col=id_col)
    factory_cls.build_index = build_index


for _cls in (BruteForceKnnFactory, UsearchKnnFactory, LshKnnFactory,
             DefaultKnnFactory):
    _bind(_cls)


def default_vector_document_index(data_column, data_table: Table, *,
                                  dimensions: int | None = None,
                                  metric=BruteForceKnnMetricKind.COS,
                                  embedder=None) -> DataIndex:
    """vector_document_index.py — DataIndex over an embedding column."""
    del embedder  # embedding happens upstream in Spark plans
    vec_col = data_column._name if hasattr(data_column, "_name") else str(data_column)
    return DataIndex(data_table,
                     BruteForceKnnFactory(dimensions=dimensions,
                                          metric=_metric_name(metric)),
                     vec_col=vec_col, id_col=ID)


default_brute_force_knn_document_index = default_vector_document_index


def default_usearch_knn_document_index(data_column, data_table: Table, *,
                                       dimensions: int | None = None,
                                       metric=USearchMetricKind.COS,
                                       embedder=None) -> DataIndex:
    del embedder
    vec_col = data_column._name if hasattr(data_column, "_name") else str(data_column)
    return DataIndex(data_table,
                     UsearchKnnFactory(dimensions=dimensions,
                                       metric=_metric_name(metric)),
                     vec_col=vec_col, id_col=ID)


def default_lsh_knn_document_index(data_column, data_table: Table, *,
                                   dimensions: int | None = None,
                                   embedder=None) -> DataIndex:
    del embedder
    vec_col = data_column._name if hasattr(data_column, "_name") else str(data_column)
    return DataIndex(data_table, LshKnnFactory(dimensions=dimensions),
                     vec_col=vec_col, id_col=ID)


def default_full_text_document_index(data_column, data_table: Table,
                                     **kw) -> DataIndex:
    """full_text_document_index.py — BM25 DataIndex over a text column."""
    text_col = data_column._name if hasattr(data_column, "_name") else str(data_column)

    class _BM25Adapter:
        def query(self, corpus, queries, *, vec_col=None, id_col="vec_id", k=10):
            return tfidf_score(corpus, queries, text_col=text_col,
                               id_col=id_col, k=k)

    return DataIndex(data_table, _BM25Adapter(), vec_col=text_col, id_col=ID)
