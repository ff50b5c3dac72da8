"""Document splitters — LLM-pipeline surface (reference
`python/pathway/xpacks/llm/splitters.py`: TokenCountSplitter).

Spark-first chunking: token windows with overlap, built from
split/sequence/slice/array_join expressions — chunk fan-out happens via
explode, so a 100 TB corpus splits with zero python and zero shuffles
(pure per-row projection until the explode)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..table import ID, Table


def token_chunks(col: Column, *, max_tokens: int = 100, overlap: int = 0) -> Column:
    """array<string> of whitespace-token chunks of `max_tokens`, adjacent
    chunks sharing `overlap` tokens."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    step = max_tokens - overlap

    def mk(toks: Column) -> Column:
        starts = F.sequence(
            F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step))
        return F.transform(
            starts,
            lambda s: F.array_join(F.slice(toks, s + 1, max_tokens), " "),
        )

    # bind the token array once — slice(toks, ...) inside the transform
    # lambda would re-split the whole document per chunk start
    # (interpreted HOFs have no CSE)
    from ..operators.dedup import bind_once

    return bind_once(F.split(F.trim(col), r"\s+"), mk)


class TokenCountSplitter:
    """reference splitters.TokenCountSplitter — min/max token bounds."""

    def __init__(self, min_tokens: int = 0, max_tokens: int = 500, overlap: int = 0):
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.overlap = overlap

    def __call__(self, table: Table, text_col: str = "text",
                 id_col: str | None = None) -> Table:
        return split_documents(
            table, text_col=text_col, id_col=id_col,
            max_tokens=self.max_tokens, overlap=self.overlap,
            min_tokens=self.min_tokens,
        )


def split_documents(table: Table, *, text_col: str = "text",
                    id_col: str | None = None, max_tokens: int = 500,
                    overlap: int = 0, min_tokens: int = 0) -> Table:
    """One row per chunk: original columns + (chunk_pos, chunk_text);
    id derives from (origin id, chunk_pos)."""
    df = table._df
    chunks = token_chunks(F.col(text_col), max_tokens=max_tokens, overlap=overlap)
    others = [c for c in df.columns if c not in (text_col, ID)]
    out = df.select(
        F.col(ID).alias("__pw_origin"),
        *[F.col(f"`{c}`") for c in others],
        F.posexplode(chunks).alias("chunk_pos", "chunk_text"),
    )
    if min_tokens > 0:
        out = out.filter(
            F.size(F.split(F.col("chunk_text"), r"\s+")) >= min_tokens
        )
    out = out.withColumn(ID, F.xxhash64("__pw_origin", "chunk_pos")).drop("__pw_origin")
    return Table(out)
