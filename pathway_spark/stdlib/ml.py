"""stdlib.ml extras: KNN classifiers and the HMM decoding reducer.

Reference: `python/pathway/stdlib/ml/classifiers/_knn_lsh.py:64`
(knn_lsh_classifier_train → query-time classifier) and
`python/pathway/stdlib/ml/hmm.py:15` (create_hmm_reducer). The
reference implementations are row-at-a-time Python over per-bucket
numpy; here classification composes the engine's own distributed KNN
operators (brute-force or IVF — one shuffle keyed on (query, neighbor),
majority vote as a count-aggregate + window), and the HMM reducer rides
the Arrow GROUPED_AGG custom-reducer path (one Viterbi pass per group,
batched, no per-row Python)."""

from __future__ import annotations

import math
from typing import Callable

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..table import ID, Table


def knn_classify(data: Table, queries: Table, *, vec_col: str = "data",
                 label_col: str = "label", id_col: str,
                 query_id_col: str | None = None, k: int = 3,
                 metric: str = "cosine", method: str = "brute",
                 self_exclude: bool = False, **lsh_kw) -> Table:
    """Majority-vote KNN classification.

    top-k neighbors per query via ``brute_force_topk`` (exact) or
    ``ivf_topk`` (approximate, ``method="lsh"``), then one count
    aggregate per (query, label) and a window argmax — ties break to the
    smallest label for determinism. Output: (query_id, predicted).

    ``self_exclude`` defaults to False: queries and corpus are normally
    distinct tables, so an id-equal neighbor is a coincidence of two id
    spaces, not a self-match, and silently dropping it could flip the
    majority vote (the reference _knn_lsh.py classifier has no id-based
    exclusion either). Pass True only when classifying a table against
    itself (leave-one-out evaluation)."""
    from ..operators.similarity import brute_force_topk, ivf_topk

    qid = query_id_col or id_col
    qs = Table(queries._df.withColumnRenamed(qid, id_col)
               if qid != id_col else queries._df)
    if method == "lsh":
        # ivf blocking is metric-free (cells from k-means); the in-cell
        # scoring is cosine — the reference's cosine/euclidean split
        # only changes ranking for unnormalized vectors
        topk = ivf_topk(data, qs, vec_col=vec_col, id_col=id_col, k=k,
                        self_exclude=self_exclude, **lsh_kw)
    else:
        topk = brute_force_topk(data, qs, vec_col=vec_col, id_col=id_col,
                                k=k, metric=metric,
                                self_exclude=self_exclude, **lsh_kw)
    labels = data._df.select(F.col(id_col).alias("neighbor_id"),
                             F.col(label_col).alias("__lbl"))
    votes = (topk._df.join(labels, "neighbor_id")
             .groupBy("query_id", "__lbl").agg(F.count(F.lit(1)).alias("n")))
    w = W.partitionBy("query_id").orderBy(F.col("n").desc(), F.col("__lbl"))
    out = (votes.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1)
           .select("query_id", F.col("__lbl").alias("predicted")))
    return Table(out.withColumn(ID, F.xxhash64("query_id")))


def knn_lsh_classifier_train(data: Table, L: int = 10,
                             type: str = "euclidean", **kwargs
                             ) -> Callable[..., Table]:
    """reference _knn_lsh.py:64 — returns a classifier closure
    ``(queries, k) -> Table`` over the trained corpus. ``L`` maps to the
    IVF probe width (the engine's ANN blocking); ``d``/``M``/``A`` are
    accepted for API parity (bucket geometry is chosen by the IVF
    k-means instead of fixed projections)."""
    metric = "l2" if type == "euclidean" else "cosine"
    vec_col = kwargs.get("vec_col", "data")
    label_col = kwargs.get("label_col", "label")
    id_col = kwargs.get("id_col", "_pw_id")

    def classify(queries: Table, k: int = 3) -> Table:
        return knn_classify(
            data, queries, vec_col=vec_col, label_col=label_col,
            id_col=id_col, k=k, metric=metric, method="lsh",
            nprobe=max(1, L // 2),
        )

    return classify


def knn_lsh_euclidean_classifier_train(data: Table, d=None, M=None, L=10,
                                       A=None, **kw) -> Callable[..., Table]:
    """reference _knn_lsh.py:305 — euclidean preset."""
    return knn_lsh_classifier_train(data, L, type="euclidean", d=d, M=M,
                                    A=A, **kw)


def create_hmm_reducer(graph=None, *, transitions: dict | None = None,
                       emissions: dict | None = None,
                       initial: dict | None = None,
                       beam_size: int | None = None,
                       num_results_kept: int | None = None):
    """reference hmm.py:15 — a reducer decoding a Hidden Markov Model
    over the group's observation sequence (Viterbi, optionally
    beam-limited).

    Model spec: either a networkx ``DiGraph`` whose edges carry
    ``weight`` = P(s→s') and nodes carry ``emission`` dicts (the
    reference's shape), or plain dicts ``transitions[s][s']``,
    ``emissions[s][obs]``, ``initial[s]``. Usage::

        dec = create_hmm_reducer(transitions=T, emissions=E, initial=I)
        table.groupby(this.key).reduce(decoded=dec(this.ts, this.obs))

    Returns the decoded hidden-state sequence (time-ordered, last
    ``num_results_kept`` states) as an array of strings. Runs on the
    Arrow GROUPED_AGG path — one Python call per group."""
    from ..reducers import _grouped_python_fold

    if graph is not None:
        transitions, emissions, initial = {}, {}, {}
        for u, v, w in graph.edges(data="weight", default=1.0):
            transitions.setdefault(u, {})[v] = float(w)
        for node, attrs in graph.nodes(data=True):
            emissions[node] = dict(attrs.get("emission", {}))
            if attrs.get("initial") is not None:
                initial[node] = float(attrs["initial"])
        if not initial:
            n = max(len(transitions), 1)
            initial = {s: 1.0 / n for s in transitions}
    if not (transitions and emissions and initial):
        raise ValueError("HMM needs transitions, emissions and initial "
                         "probabilities (dicts or a weighted DiGraph)")

    NEG_INF = float("-inf")

    def _log(p: float) -> float:
        return math.log(p) if p > 0 else NEG_INF

    lt = {s: {s2: _log(p) for s2, p in row.items()}
          for s, row in transitions.items()}
    le = {s: {o: _log(p) for o, p in row.items()}
          for s, row in emissions.items()}
    li = {s: _log(p) for s, p in initial.items()}
    states = sorted(le)

    def fold(rows):
        # rows: (time, observation); decode in time order
        seq = [obs for _, obs in sorted(rows, key=lambda r: r[0])]
        if not seq:
            return []
        # scores: state -> (logprob, backpath tuple)
        scores = {
            s: (li.get(s, NEG_INF) + le[s].get(seq[0], NEG_INF), (s,))
            for s in states
        }
        for obs in seq[1:]:
            if beam_size is not None:
                kept = sorted(scores, key=lambda s: scores[s][0],
                              reverse=True)[:beam_size]
                scores = {s: scores[s] for s in kept}
            nxt = {}
            for s2 in states:
                best, path = NEG_INF, None
                for s, (lp, bp) in scores.items():
                    cand = lp + lt.get(s, {}).get(s2, NEG_INF)
                    if cand > best or (cand == best and path is not None
                                       and bp < path):
                        best, path = cand, bp
                emit = le[s2].get(obs, NEG_INF)
                if path is not None and best + emit > NEG_INF:
                    nxt[s2] = (best + emit, path + (s2,))
            if not nxt:  # impossible observation: restart from priors
                nxt = {
                    s: (li.get(s, NEG_INF) + le[s].get(obs, NEG_INF), (s,))
                    for s in states
                }
            scores = nxt
        best_state = max(scores, key=lambda s: (scores[s][0], s))
        path = list(scores[best_state][1])
        if num_results_kept is not None:
            path = path[-num_results_kept:]
        return path

    def make(*exprs):
        return _grouped_python_fold("hmm_viterbi", fold, list[str], exprs)

    return make


__all__ = [
    "knn_classify",
    "knn_lsh_classifier_train",
    "knn_lsh_euclidean_classifier_train",
    "create_hmm_reducer",
]
