"""`pw.ml.smart_table_ops` — edge/feature-level fuzzy matching.

Reference: `python/pathway/stdlib/ml/smart_table_ops/_fuzzy_join.py`
(Node/Feature/Edge/JoinResult :14-33, FuzzyJoinFeatureGeneration :43,
FuzzyJoinNormalization :78, _fuzzy_match :321, fuzzy_self_match :249,
fuzzy_match :265, fuzzy_match_with_hint :282).

Semantics preserved exactly:
- feature frequencies over ALL edges (both sides) pick the
  normalization weight: WEIGHT 1/2^ceil(log2 cnt), LOGWEIGHT
  1/ceil(log2(cnt+1)), NONE identity;
- candidate pairs come only from LIGHT features (cnt <
  HEAVY_LIGHT_THRESHOLD) — the heavy/light split is the reference's own
  join-bomb guard, identical in spirit to our q31 max_doc_freq pruning;
- heavy features contribute weight only to pairs already found via
  light features;
- one best match per left node, then per right node (mutual-best),
  with the reference's deterministic (weight, min_id, max_id)
  pseudo-weight tie-break;
- `by_hand_match` rows override: their nodes are withheld from
  matching and the forced pairs are unioned into the result.

Spark mapping: two hash joins on `feature` (light candidates + heavy
rescore) and two window argmax passes; every aggregation is map-side
combinable, nothing collects to the driver.
"""

from __future__ import annotations

import math
from enum import IntEnum, auto
from typing import Any, Callable

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..schema import Schema
from ..table import ID, Table

__all__ = [
    "Node", "Feature", "Edge", "JoinResult",
    "FuzzyJoinFeatureGeneration", "FuzzyJoinNormalization",
    "fuzzy_match", "fuzzy_self_match", "fuzzy_match_with_hint",
    "fuzzy_match_tables", "smart_fuzzy_match",
]


class Node(Schema):
    pass


class Feature(Schema):
    weight: float
    normalization_type: int


class Edge(Schema):
    node: int
    feature: int
    weight: float


class JoinResult(Schema):
    left: int
    right: int
    weight: float


def _tokenize(obj: Any) -> list[str]:
    return str(obj).split()


def _letters(obj: Any) -> list[str]:
    return [c.lower() for c in str(obj) if c.isalnum()]


class FuzzyJoinFeatureGeneration(IntEnum):
    AUTO = auto()
    TOKENIZE = auto()
    LETTERS = auto()

    @property
    def generate(self) -> Callable[[Any], Any]:
        return _letters if self is FuzzyJoinFeatureGeneration.LETTERS else _tokenize


class FuzzyJoinNormalization(IntEnum):
    WEIGHT = auto()
    LOGWEIGHT = auto()
    NONE = auto()

    @property
    def normalize(self) -> Callable[[float], float]:
        if self is FuzzyJoinNormalization.WEIGHT:
            return lambda cnt: 0.0 if cnt == 0 else 1 / (2 ** math.ceil(math.log2(cnt)))
        if self is FuzzyJoinNormalization.LOGWEIGHT:
            return lambda cnt: 0.0 if cnt == 0 else 1 / math.ceil(math.log2(cnt + 1))
        return lambda cnt: cnt


def _norm_weight_col(cnt, ntype):
    """Column form of FuzzyJoinNormalization.normalize (kept JVM-side)."""
    w_weight = F.when(cnt == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) / F.pow(F.lit(2.0), F.ceil(F.log2(cnt.cast("double")))))
    w_log = F.when(cnt == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) / F.ceil(F.log2(cnt.cast("double") + 1.0)))
    return (
        F.when(ntype == int(FuzzyJoinNormalization.WEIGHT), w_weight)
        .when(ntype == int(FuzzyJoinNormalization.LOGWEIGHT), w_log)
        .otherwise(cnt.cast("double"))
    )


def _edges_df(t: Table) -> DataFrame:
    return t._df.select(
        F.col("node").cast("long").alias("node"),
        F.col("feature").cast("long").alias("feature"),
        F.col("weight").cast("double").alias("weight"),
    )


def _fuzzy_match(edges_left: Table, edges_right: Table, features: Table,
                 symmetric: bool, threshold: int,
                 by_hand_match: Table | None) -> Table:
    el = _edges_df(edges_left)
    er = el if symmetric else _edges_df(edges_right)

    if by_hand_match is not None:
        bh = by_hand_match._df.select(
            F.col("left").cast("long").alias("left"),
            F.col("right").cast("long").alias("right"),
            F.col("weight").cast("double").alias("weight"),
        )
        lnodes = bh.select(F.col("left").alias("node")).distinct()
        rnodes = bh.select(F.col("right").alias("node")).distinct()
        # symmetric filters only by_hand.left nodes — matching the
        # reference's _filter_out_matched_by_hand (:300) exactly
        el = el.join(F.broadcast(lnodes), "node", "left_anti")
        er = el if symmetric else er.join(F.broadcast(rnodes), "node", "left_anti")

    all_edges = el if symmetric else el.union(er)
    fcnt = all_edges.groupBy("feature").agg(F.count("*").alias("cnt"))

    feats = features._df.select(
        F.col(ID).alias("feature"),
        F.col("weight").cast("double").alias("fweight"),
        F.col("normalization_type").cast("int").alias("ntype"),
    )
    featw = (
        feats.join(fcnt, "feature", "left")
        .na.fill({"cnt": 0})
        .select("feature",
                (F.col("fweight")
                 * _norm_weight_col(F.col("cnt"), F.col("ntype"))).alias("fw"),
                "cnt")
    )

    light = featw.filter(F.col("cnt") < threshold).select("feature", "fw")
    heavy = featw.filter(F.col("cnt") >= threshold).select("feature", "fw")

    ell = el.join(light, "feature").select(
        "feature", F.col("node").alias("left"),
        (F.col("weight") * F.col("fw")).alias("wl_fw"), F.col("weight").alias("wl"))
    erl = er.join(light.select("feature"), "feature").select(
        "feature", F.col("node").alias("right"), F.col("weight").alias("wr"))
    cand = (
        ell.join(erl, "feature")
        .withColumn("w", F.col("wl_fw") * F.col("wr"))
    )
    if symmetric:
        cand = cand.filter(F.col("left") != F.col("right"))
    pair_light = cand.groupBy("left", "right").agg(F.sum("w").alias("weight"))

    elh = el.join(heavy, "feature").select(
        "feature", F.col("node").alias("left"),
        (F.col("weight") * F.col("fw")).alias("wl_fw"))
    erh = er.join(heavy.select("feature"), "feature").select(
        "feature", F.col("node").alias("right"), F.col("weight").alias("wr"))
    pair_heavy = (
        pair_light.select("left", "right")
        .join(elh, "left")
        .join(erh, ["right", "feature"])
        .groupBy("left", "right")
        .agg(F.sum(F.col("wl_fw") * F.col("wr")).alias("weight"))
    )

    total = (
        pair_light.unionByName(pair_heavy)
        .groupBy("left", "right")
        .agg(F.sum("weight").alias("weight"))
        .withColumn("_mn", F.least("left", "right"))
        .withColumn("_mx", F.greatest("left", "right"))
    )
    order = [F.col("weight").desc(), F.col("_mn").desc(), F.col("_mx").desc()]
    per_left = (
        total.withColumn("_rn", F.row_number().over(
            W.partitionBy("left").orderBy(*order)))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    per_right = (
        per_left.withColumn("_rn", F.row_number().over(
            W.partitionBy("right").orderBy(*order)))
        .filter(F.col("_rn") == 1).drop("_rn", "_mn", "_mx")
    )
    out = per_right
    if symmetric:
        out = out.filter(F.col("left") < F.col("right"))
    if by_hand_match is not None:
        out = out.unionByName(bh)
    return Table(out.withColumn(ID, F.xxhash64("left", "right")))


def fuzzy_self_match(edges: Table, features: Table,
                     by_hand_match: Table | None = None,
                     HEAVY_LIGHT_THRESHOLD: int = 100) -> Table:
    """_fuzzy_join.py:249."""
    return _fuzzy_match(edges, edges, features, True,
                        HEAVY_LIGHT_THRESHOLD, by_hand_match)


def fuzzy_match(edges_left: Table, edges_right: Table, features: Table,
                by_hand_match: Table | None = None,
                HEAVY_LIGHT_THRESHOLD: int = 100) -> Table:
    """_fuzzy_join.py:265."""
    return _fuzzy_match(edges_left, edges_right, features, False,
                        HEAVY_LIGHT_THRESHOLD, by_hand_match)


def fuzzy_match_with_hint(edges_left: Table, edges_right: Table,
                          features: Table, by_hand_match: Table,
                          HEAVY_LIGHT_THRESHOLD: int = 100) -> Table:
    """_fuzzy_join.py:282."""
    return _fuzzy_match(edges_left, edges_right, features, False,
                        HEAVY_LIGHT_THRESHOLD, by_hand_match)


# text-level entry points live in ml/__init__.py; re-exported here so the
# reference import path `pw.ml.smart_table_ops.fuzzy_match_tables` works.
def fuzzy_match_tables(*args, **kw):
    from . import fuzzy_match_tables as impl
    return impl(*args, **kw)


def smart_fuzzy_match(*args, **kw):
    from . import smart_fuzzy_join as impl
    return impl(*args, **kw)
