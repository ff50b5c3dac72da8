"""`pw.ml` parity — fuzzy joins via LSH (reference
`stdlib/ml/smart_table_ops/_fuzzy_join.py`, surfaced at stdlib/ml/__init__.py:5-15).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.dedup import minhash_signature, word_ngrams
from ..table import ID, Table


def fuzzy_match_tables(left: Table, right: Table, *, left_col: str, right_col: str,
                       threshold: float = 0.3, n: int = 1) -> Table:
    """Similarity join: token-Jaccard via inverted-index join (exact),
    output (left_id, right_id, score). The reference buckets by simhash;
    the inverted index gives the same asymptotics with exact scores."""
    l = left._df.select(F.col(ID).alias("left_id"), word_ngrams(F.col(left_col), n).alias("ga"))
    r = right._df.select(F.col(ID).alias("right_id"), word_ngrams(F.col(right_col), n).alias("gb"))
    le = l.select("left_id", F.explode("ga").alias("g"))
    re_ = r.select("right_id", F.explode("gb").alias("g"))
    common = le.join(re_, "g").groupBy("left_id", "right_id").agg(F.count(F.lit(1)).alias("common"))
    sa = l.select("left_id", F.size("ga").alias("sza"))
    sb = r.select("right_id", F.size("gb").alias("szb"))
    out = (
        common.join(sa, "left_id").join(sb, "right_id")
        .withColumn("score", F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")))
        .filter(F.col("score") >= threshold)
        .select("left_id", "right_id", "score")
    )
    return Table(out.withColumn(ID, F.xxhash64("left_id", "right_id")))


def smart_fuzzy_join(left: Table, right: Table, *, left_col: str, right_col: str,
                     threshold: float = 0.3) -> Table:
    """Best match per left row (highest score, ties by right_id)."""
    matches = fuzzy_match_tables(left, right, left_col=left_col,
                                 right_col=right_col, threshold=threshold)
    w = W.partitionBy("left_id").orderBy(F.col("score").desc(), F.col("right_id"))
    out = matches._df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    return Table(out)


# reference `stdlib/ml/__init__.py` exports its submodules; ours mirror
# the same import paths (classifiers, datasets, hmm, smart_table_ops,
# utils — plus document_store/splitters which the reference keeps in the
# llm xpack but tutorials import from both places).
from . import classifiers, datasets, hmm, smart_table_ops, utils  # noqa: E402
from .smart_table_ops import (  # noqa: E402
    Edge,
    Feature,
    FuzzyJoinFeatureGeneration,
    FuzzyJoinNormalization,
    JoinResult,
    Node,
    fuzzy_match,
    fuzzy_match_with_hint,
    fuzzy_self_match,
)

smart_fuzzy_match = smart_fuzzy_join
