"""Splitters — reference `python/pathway/xpacks/llm/splitters.py`.

`TokenCountSplitter` lives in `pathway_spark/ml/splitters.py` (JVM-side
explode over token windows — the scale path). This module adds the
remaining reference splitters on the same contract:
``splitter(table, text_col=..., id_col=...) -> Table`` of
(id_col, chunk_pos, chunk_text).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ...ml.splitters import TokenCountSplitter, split_documents
from ...table import ID, Table


class NullSplitter:
    """reference: pass documents through as single chunks."""

    def __call__(self, table: Table, *, text_col: str = "text",
                 id_col: str = "doc_id") -> Table:
        df = table._df.select(
            F.col(id_col), F.lit(0).alias("chunk_pos"),
            F.col(text_col).alias("chunk_text"),
        )
        return Table(df.withColumn(ID, F.xxhash64(id_col, "chunk_pos")))


class RecursiveSplitter:
    """reference RecursiveSplitter (langchain-style): split on the first
    separator that yields chunks under `chunk_size` characters, descending
    through the separator list. Pure JVM ops: split → posexplode → window
    re-chunk — no Python in the hot path."""

    def __init__(self, *, chunk_size: int = 400, chunk_overlap: int = 0,
                 separators: list[str] | None = None):
        if chunk_overlap:
            # overlap requires the token-window splitter (same contract)
            self._fallback = TokenCountSplitter(
                max_tokens=max(1, chunk_size // 5), overlap=chunk_overlap // 5)
        else:
            self._fallback = None
        self.chunk_size = chunk_size
        self.separators = separators or ["\n\n", "\n", ". ", " "]

    def __call__(self, table: Table, *, text_col: str = "text",
                 id_col: str = "doc_id") -> Table:
        if self._fallback is not None:
            return self._fallback(table, text_col=text_col, id_col=id_col)
        # greedy re-chunk: split on the coarsest separator, then pack
        # consecutive pieces while staying under chunk_size
        sep = self.separators[0]
        df = table._df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), F.lit(sep).cast("string")))
             .alias("piece_pos", "piece"),
        )
        # running character count per doc -> chunk index (prefix sums via
        # window; one shuffle on id_col)
        from pyspark.sql.window import Window

        w = Window.partitionBy(id_col).orderBy("piece_pos")
        df = df.withColumn("plen", F.length("piece") + F.lit(len(sep)))
        df = df.withColumn("cum", F.sum("plen").over(w))
        df = df.withColumn(
            "chunk_pos",
            F.floor((F.col("cum") - F.col("plen")) / F.lit(self.chunk_size))
             .cast("int"),
        )
        # collect_list order is not contractual across a shuffle — sort the
        # (pos, piece) structs inside the group before joining
        out = (df.groupBy(id_col, "chunk_pos")
                 .agg(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("piece_pos", "piece"))),
                         lambda s: s["piece"]),
                     sep).alias("chunk_text"))
                 .filter(F.length("chunk_text") > 0))
        return Table(out.withColumn(ID, F.xxhash64(id_col, "chunk_pos")))


__all__ = ["TokenCountSplitter", "NullSplitter", "RecursiveSplitter",
           "split_documents"]
