"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure built-in-function expressions (regexp/split/HOF) — zero python
in the hot path, so they run inside whole-stage codegen and scale
linearly with no shuffles (per-row projections).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..table import ID, Table
from .dedup import char_ngrams, _tokens

# tiny deterministic stopword lists per language (public common words)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
    "de": ["der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "für"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "他", "这", "中"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (BPE-ish regex variant below)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def subword_count(col: Column) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs —
    `\\w+`-split plus non-space symbols (deterministic, SQL-expressible)."""
    return F.size(
        F.filter(
            F.split(F.lower(col), r"[^\w]+"),
            lambda x: F.length(x) > 0,
        )
    ).cast("long")


def quality_score(col: Column, *, digits: int | None = 6) -> Column:
    """Deterministic [0,1] doc-quality heuristic: mean word length band,
    alpha ratio, and repetition penalty (distinct/total token ratio).

    ``digits=None`` skips the final ROUND, returning the raw IEEE double
    (bit-identical across engines given identical op order — callers that
    need a cross-engine-stable integer should floor(q*1e6) instead of
    rounding, because double ROUND ties are engine-dependent)."""
    toks = _tokens(col)
    n = F.size(toks)
    mean_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(n, F.lit(1))
    alpha_ratio = (
        F.length(F.regexp_replace(col, r"[^A-Za-z]", "")) /
        F.greatest(F.length(col), F.lit(1))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    len_score = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    raw = (len_score * 0.34 + alpha_ratio * 0.33 + distinct_ratio * 0.33).cast("double")
    return raw if digits is None else F.round(raw, digits)


def quality_score_u(col: Column) -> Column:
    """Integer-exact micro-units quality score (same heuristic as
    quality_score, ×1e6): every term is computed in pure integer
    arithmetic — the mean-length band test becomes 3n ≤ Σlen ≤ 10n, and
    each ratio becomes an exact integer floor-division — so any SQL
    engine reproduces the value bit-for-bit at any data scale (a float
    formulation only matches while both engines happen to evaluate the
    identical IEEE op sequence)."""
    toks = _tokens(col)
    n = F.greatest(F.size(toks), F.lit(1)).cast("long")
    sum_len = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda a, t: a + F.length(t))
    len_u = F.when((sum_len >= 3 * n) & (sum_len <= 10 * n),
                   F.lit(340_000)).otherwise(F.lit(170_000)).cast("long")
    alpha_chars = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("long")
    total_chars = F.greatest(F.length(col), F.lit(1)).cast("long")

    def idiv(a: Column, b: Column) -> Column:
        # exact integer floor-div (a ≥ 0): a - pmod(a,b) divides exactly
        return ((a - F.pmod(a, b)) / b).cast("long")

    alpha_u = idiv(F.lit(330_000) * alpha_chars, total_chars)
    distinct_u = idiv(
        F.lit(330_000) * F.size(F.array_distinct(toks)).cast("long"), n)
    return len_u + alpha_u + distinct_u


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = _tokens(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def detect_language(col: Column) -> Column:
    """Stopword-vote language ID over STOPWORDS — returns the language
    with the highest stopword hit count ('und' if all zero)."""
    toks = _tokens(col)
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        # zh has no word boundaries: count substring hits instead
        if lang == "zh":
            score = sum(
                (F.length(col) - F.length(F.replace(col, F.lit(w), F.lit("")))) / len(w)
                for w in words
            )
        else:
            score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast("double")
        scores.append(F.struct(score.cast("double").alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: Column, *, n: int = 5, window: int = 4,
                hash_fn: str = "xxhash64") -> Column:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    char n-gram hashes -> sliding min over `window` -> distinct sorted
    fingerprint hash set. ``hash_fn="md5"`` uses the 60-bit cross-engine
    hash so an external SQL oracle can reproduce the exact set."""
    from .dedup import bind_once, hash64_cross

    gram_hash = F.xxhash64 if hash_fn == "xxhash64" else hash64_cross

    def winnow(hashes: Column) -> Column:
        idx = F.sequence(
            F.lit(0), F.greatest(F.size(hashes) - window, F.lit(0)))
        mins = F.transform(
            idx, lambda i: F.array_min(F.slice(hashes, i + 1, window)))
        return F.array_sort(F.array_distinct(mins))

    # bind the gram-hash array once (HOF lambdas are interpreted with no
    # CSE): slice(hashes, ...) inside the winnow lambda re-evaluated the
    # whole char_ngrams+hash pipeline per window position — O(L²) md5
    # calls per document, measured at ~5 s/row on 300-char docs
    return bind_once(
        F.transform(char_ngrams(col, n), lambda g: gram_hash(g)), winnow)


def fingerprint64(col: Column, *, n: int = 5, window: int = 4) -> Column:
    """Single 64-bit rolling fingerprint (hash of the winnowed set)."""
    return F.xxhash64(fingerprint(col, n=n, window=window).cast("string"))


def analyze(table: Table, text_col: str = "text") -> Table:
    """One-pass text profile: token/char counts, quality, language."""
    c = F.col(text_col)
    df = table._df.withColumns({
        "n_tokens": token_count(c),
        "n_subwords": subword_count(c),
        "quality": quality_score(c),
        "lang_detected": detect_language(c),
        "fp64": fingerprint64(c),
    })
    return Table(df)
