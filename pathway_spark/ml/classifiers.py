"""`pw.ml.classifiers` — reference
`stdlib/ml/classifiers/__init__.py` (knn_lsh_* family, DistanceTypes).
Implementations live in `stdlib/ml.py` (Spark KNN over the shared
similarity operators); this module provides the reference import path.
"""

from __future__ import annotations

from ..stdlib.ml import (
    knn_classify,
    knn_lsh_classifier_train,
    knn_lsh_euclidean_classifier_train,
)

# reference `_knn_lsh.py` DistanceTypes: the distance metrics the trainer
# accepts (our topk operators take the same names as `metric=`)
DistanceTypes = ("euclidean", "cosine")

knn_lsh_train = knn_lsh_classifier_train


def knn_lsh_classify(classifier, data_labels, queries, k: int = 3):
    """classifiers/__init__.py — apply a trained classifier closure."""
    return classifier(data_labels, queries, k=k)


def knn_lsh_generic_classifier_train(data, distance_function=None, **kw):
    """Generic-metric variant (reference `_knn_lsh.py`): the metric is
    named, not an arbitrary callable — Spark plans need expressible
    metrics (cosine / euclidean), and an opaque Python distance would
    force a row-at-a-time UDF on the hot path."""
    kind = distance_function if isinstance(distance_function, str) else "cosine"
    return knn_lsh_classifier_train(data, type=kind, **kw)


__all__ = [
    "knn_lsh_classifier_train", "knn_lsh_train", "knn_lsh_classify",
    "knn_lsh_generic_classifier_train", "knn_lsh_euclidean_classifier_train",
    "DistanceTypes", "knn_classify",
]
