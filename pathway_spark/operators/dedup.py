"""Large-scale deduplication operators for training-data pipelines.

Not in the reference's core (its fuzzy-join stdlib `stdlib/ml/
smart_table_ops/_fuzzy_join.py` covers pieces); these are the 100 TB-scale
designs:

- exact_dedup:      hash-groupBy — one shuffle on the content hash.
- ngram_jaccard:    exact all-pairs Jaccard via an inverted token index
                    (explode -> self-join on token -> count) — the classic
                    scalable pattern; frequent-shingle pruning bounds the
                    join fan-out on power-law corpora.
- minhash_lsh:      shingle -> k minhashes -> b bands -> bucket join ->
                    exact-Jaccard verification of candidates. All hashing
                    is xxhash64 (JVM-side), no python in the hot path.
- simhash:          64-bit simhash + pigeonhole chunk blocking on hamming
                    distance.
- embedding_neardup: cosine near-duplicate pairs over an embedding column
                    via random-hyperplane LSH blocking + exact verify.

Every operator returns canonical pair tables (id_a < id_b) so results are
deterministic and order-insensitive.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..table import ID, Table

# Modulus for the cross-engine universal minhash family
# h_j(x) = (A_j * (x mod P) + B_j) mod P — all arithmetic stays under
# 2^63 (A_j, x mod P < 1e9 -> product < 1e18), so Spark and any SQL
# engine compute identical BIGINT values with no overflow/wrap concerns.
MINHASH_P = 1_000_000_007


def minhash_cross_constants(num_hashes: int) -> list[tuple[int, int]]:
    """(A_j, B_j) universal-hash constants derived from md5(j) so the
    Spark expression and an external SQL oracle can embed the *same*
    literals (both sides call this or copy its output)."""
    out = []
    for j in range(num_hashes):
        h = hashlib.md5(f"minhash:{j}".encode()).hexdigest()
        a = int(h[:15], 16) % (MINHASH_P - 1) + 1
        b = int(h[15:30], 16) % MINHASH_P
        out.append((a, b))
    return out


# ------------------------------------------------------------------ tokenize

def _tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def hash64_cross(col: Column) -> Column:
    """60-bit deterministic hash reproducible outside Spark: the first 15
    hex digits of md5, parsed as an integer. DuckDB mirror:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``. Used where an external
    oracle must recompute the exact hash (xxhash64 is Spark-specific);
    xxhash64 remains the default everywhere else (faster, 64 bits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_ngrams(col: Column, n: int) -> Column:
    """Array of word n-gram shingles (distinct)."""
    if n == 1:
        return F.array_distinct(_tokens(col))

    def mk(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        grams = F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
        return F.array_distinct(
            F.when(F.size(toks) >= n, grams).otherwise(F.array())
        )

    # bind tokens once: slice(toks, ...) inside the transform lambda
    # would otherwise re-split the whole string per gram index
    return bind_once(_tokens(col), mk)


def exploded_word_ngrams(df: DataFrame, text_col: str, id_col: str, n: int,
                         *, distinct: bool = True) -> DataFrame:
    """(doc, g) word n-gram rows via posexplode + window lead.

    The scale path for shingling: array HOF lambdas (transform/slice/
    array_join) are interpreted per element, which dominates runtime;
    posexplode + lead + concat_ws stays in whole-stage codegen, paying
    only one per-doc sort for the window. `distinct=False` skips the
    set-semantics shuffle for consumers where duplicates are harmless
    (minhash: min over duplicates == min over distinct)."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    if n == 1:
        out = toks.select("doc", F.col("tok").alias("g"))
    else:
        w = W.partitionBy("doc").orderBy("pos")
        parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
        last = F.lead("tok", n - 1).over(w)
        out = (
            toks.select("doc", F.when(last.isNotNull(), F.concat_ws(" ", *parts)).alias("g"))
            .filter(F.col("g").isNotNull())
        )
    return out.distinct() if distinct else out


def bind_once(expr: Column, fn) -> Column:
    """Evaluate `expr` once per row and pass it to `fn` as a bound
    higher-order-function lambda variable.

    Catalyst evaluates HOF lambdas interpreted (no codegen, no common-
    subexpression elimination), so an expression referenced INSIDE a
    lambda body is re-evaluated per element — `transform(idx, i ->
    f(big, i))` costs O(|idx| · cost(big)).  Wrapping `big` as the
    single element of an outer transform binds it to a lambda variable,
    which the interpreter evaluates exactly once per row (guide §4:
    per-task work; measured 41 min → seconds on the winnowing
    fingerprint at 500 docs)."""
    return F.transform(F.array(expr), fn)[0]


def char_ngrams(col: Column, n: int) -> Column:
    def mk(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - n + 1, F.lit(1)))
        grams = F.transform(idx, lambda i: F.substring(s, i, F.lit(n)))
        return F.array_distinct(
            F.when(F.length(s) >= n, grams).otherwise(F.array()))

    # bind the lowered string once: substring(s, i, n) inside the
    # transform lambda would otherwise re-run lower(trim(col)) per index
    return bind_once(F.lower(F.trim(col)), mk)


# ------------------------------------------------------------------ exact

def exact_dedup(table: Table, text_col: str, id_col: str) -> Table:
    """Keep the row with the smallest id per exact content; one
    hash-partition shuffle, map-side combine."""
    df = table._df
    h = F.xxhash64(F.col(text_col))
    keep = (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min_by(F.struct(*[F.col(c) for c in df.columns]), F.col(id_col)).alias("r"),
             F.count(F.lit(1)).alias("_pw_dup_count"))
        .select("r.*", "_pw_dup_count")
    )
    return Table(keep.drop("__h"))


def exact_dup_groups(table: Table, text_col: str, id_col: str) -> Table:
    """(canonical_id, dup_id) pairs for every exact-duplicate row."""
    df = table._df.select(F.col(id_col), F.xxhash64(F.col(text_col)).alias("__h"))
    canon = df.groupBy("__h").agg(F.min(id_col).alias("canonical_id"),
                                  F.count(F.lit(1)).alias("n"))
    pairs = (
        df.join(canon, "__h")
        .filter((F.col("n") > 1) & (F.col(id_col) != F.col("canonical_id")))
        .select(F.col("canonical_id"), F.col(id_col).alias("dup_id"))
    )
    return Table(pairs.withColumn(ID, F.xxhash64("canonical_id", "dup_id")))


# ------------------------------------------------------------------ jaccard

DEFAULT_MAX_DOC_FREQ = 1000


def ngram_jaccard_pairs(table: Table, text_col: str, id_col: str, *,
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int | None = DEFAULT_MAX_DOC_FREQ) -> Table:
    """All-pairs n-gram Jaccard ≥ threshold via inverted index.

    Shuffle plan: explode shingles (no shuffle) -> shuffle on shingle for
    the self-join -> shuffle on (id_a,id_b) for the intersection count.

    `max_doc_freq` (default 1000) drops shingles appearing in more
    documents than the bound BEFORE the self-join: on a power-law corpus
    a shingle in k docs creates k² join rows, so an unbounded default is
    a 100 TB scale-killer. Dropped shingles still count toward each
    document's shingle-set size, so Jaccard is under- (never over-)
    estimated — pairs held together only by ubiquitous boilerplate are
    the ones pruned. Pass ``max_doc_freq=None`` for the exact all-pairs
    result (opt-in; safe only on bounded corpora).
    """
    df = table._df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))
    # hash shingles to 8-byte keys BEFORE the distinct: the set-semantics
    # shuffle then carries (doc, long) instead of (doc, string) —
    # collision odds ~|shingles|²/2⁶⁴, nil.
    #
    # LAZY localCheckpoint, not persist(): sizes/hot/self-join reference
    # this relation 4×, and per-branch column pruning makes each branch
    # canonically DIFFERENT, so neither ReuseExchange nor AQE's stage
    # cache dedups them — the executed plan tokenized the corpus SIX
    # times (r11 stage audit).  An SQL-level persist() dedups but (a)
    # concurrent broadcast-build jobs race to fill it, re-running the
    # lineage anyway, and (b) the CacheManager rewrites every LATER
    # structurally-equal query to read the cache — cross-invocation
    # result reuse the bench rules forbid.  A lazy RDD localCheckpoint
    # shares ONE materialization across all six consumers inside each
    # execution (plan: 6× Scan ExistingRDD, 0 extra tokenizes), is
    # invisible to the CacheManager, and dies with the DataFrame —
    # a fresh invocation recomputes from parquet.  Honest interleaved
    # A/B medians 1.51 → 0.84 s (−44%), results identical.  Lineage
    # truncation trade-off: Spark CANNOT recompute local-checkpointed
    # partitions, so losing an executor that holds checkpoint blocks
    # (dynamic allocation, decommission, OOM kill) fails the
    # in-flight query outright — the CALLER must re-run it.  Same
    # trade the iterate/differential paths already make; deployments
    # with preemptible executors should re-submit failed queries (or
    # swap this for persist() at the cost of the CacheManager leak).
    sh = (
        exploded_word_ngrams(df, "t", "doc", n, distinct=False)
        .select("doc", F.xxhash64("g").alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    if max_doc_freq is not None:
        # the OVER-bound gram list is small by construction (only grams
        # hot enough to be join bombs), so prune with a broadcast
        # anti-join — map-side filter, no extra shuffle of sh
        hot = (
            sh.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_doc_freq).select("g")
        )
        sh = sh.join(F.broadcast(hot), "g", "left_anti")
    a = sh.select(F.col("doc").alias("a"), "g")
    b = sh.select(F.col("doc").alias("b"), "g")
    common = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn("jaccard", F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a").alias("id_a"), F.col("b").alias("id_b"),
            F.col("jaccard"),
        )
    )
    return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))


# ------------------------------------------------------------------ minhash

def minhash_signature(col: Column, *, n: int = 3, num_hashes: int = 64,
                      char_level: bool = False) -> Column:
    """Array of `num_hashes` minhash values in one pass over the shingles
    (single fold; the shingling subtree is evaluated once per row, not
    once per hash — HOFs are interpreted, so repeated subtrees are not
    CSE'd by codegen)."""
    grams = char_ngrams(col, n) if char_level else word_ngrams(col, n)
    max_long = (1 << 63) - 1
    init = F.array(*[F.lit(max_long).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        grams,
        init,
        lambda acc, g: F.zip_with(
            acc,
            F.array(*[F.xxhash64(g, F.lit(j)) for j in range(num_hashes)]),
            lambda a, h: F.least(a, h),
        ),
    )


def minhash_signatures_df(df, text_col: str, id_col: str, *, n: int = 3,
                          num_hashes: int = 64, char_level: bool = False):
    """(id, h0..h{k-1}) minhash signature frame via explode → hash →
    min-agg. This is the scale path: the projection after explode is
    whole-stage-codegen'd (xxhash64 is a codegen expression, unlike
    array HOF lambdas), and the min-agg is map-side partial, so the
    shuffle carries one signature row per document."""
    if char_level:
        grams = char_ngrams(F.col(text_col), n)
        ex = df.select(F.col(id_col).alias("doc"), F.explode(grams).alias("g"))
    else:
        # duplicates don't change a min — skip the distinct shuffle
        ex = exploded_word_ngrams(df, text_col, id_col, n, distinct=False)
    # hash the gram string ONCE; the num_hashes seeded hashes then run on
    # the 8-byte value instead of re-hashing the string per seed
    ex = ex.select("doc", F.xxhash64("g").alias("hg"))
    aggs = [
        F.min(F.xxhash64(F.col("hg"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return ex.groupBy("doc").agg(*aggs)


def minhash_lsh_pairs(table: Table, text_col: str, id_col: str, *,
                      n: int = 3, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.5, verify: bool = True,
                      hash_fn: str = "xxhash64") -> Table:
    """MinHash+LSH near-duplicate pairs.

    shingle → num_hashes minhashes → `bands` band-hashes → explode →
    bucket self-join → exact-Jaccard verification (only on candidates).
    With r = num_hashes/bands rows per band, a pair with Jaccard J is
    caught with prob 1-(1-J^r)^bands (≈1 for J ≥ threshold with defaults).

    ``hash_fn="cross"`` switches to the cross-engine hash family: grams
    hash via 60-bit md5 (hash64_cross), per-seed minhashes via the
    (A_j*x+B_j) mod P universal family (minhash_cross_constants), and
    band keys are the literal r-tuples — every value is reproducible in
    plain SQL, so an external oracle can mirror the banding EXACTLY
    (candidate set included) instead of betting on recall=1. Default
    stays xxhash64 (faster; Spark-only).
    """
    r = num_hashes // bands
    df = table._df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))
    # one shared (doc, gram-hash) frame feeds signature, sizes and
    # verification — self-joins would otherwise recompute the shingling
    # once per reference (distinct is safe: min over dups == min over
    # set).  Lazy RDD localCheckpoint, not persist(): same rationale as
    # ngram_jaccard_pairs above — one materialization per execution,
    # invisible to the CacheManager (no cross-invocation reuse), no
    # broadcast-build cache races.
    gram_hash = (F.xxhash64("g") if hash_fn == "xxhash64"
                 else hash64_cross(F.col("g")))
    sh = (
        exploded_word_ngrams(df, "t", "doc", n, distinct=False)
        .select("doc", gram_hash.alias("hg"))
        .distinct()  # distinct on (doc, long), not (doc, string)
        .localCheckpoint(eager=False)
    )
    if hash_fn == "xxhash64":
        seed_hashes = [F.xxhash64(F.col("hg"), F.lit(j)) for j in range(num_hashes)]
    else:
        consts = minhash_cross_constants(num_hashes)
        xm = F.col("hg") % F.lit(MINHASH_P)
        seed_hashes = [(F.lit(a) * xm + F.lit(b)) % F.lit(MINHASH_P)
                       for a, b in consts]
    sig = sh.groupBy("doc").agg(*[
        F.min(h).alias(f"h{j}") for j, h in enumerate(seed_hashes)
    ]).localCheckpoint(eager=False)
    if hash_fn == "xxhash64":
        band_key = [
            F.xxhash64(*[F.col(f"h{bi * r + j}") for j in range(r)])
            for bi in range(bands)
        ]
    else:
        # literal r-tuple as the bucket key (string concat) — equality on
        # the tuple, no second-level hash an oracle would have to mimic
        band_key = [
            F.concat_ws("_", *[F.col(f"h{bi * r + j}").cast("string")
                               for j in range(r)])
            for bi in range(bands)
        ]
    banded = sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                band_key[bi].alias("bh"),
            )
            for bi in range(bands)
        ])).alias("bb"),
    ).select("doc", "bb.band", "bb.bh")
    ca = banded.select(F.col("doc").alias("a"), "band", "bh")
    cb = banded.select(F.col("doc").alias("b"), "band", "bh")
    cand = (
        ca.join(cb, ["band", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if not verify:
        out = cand.select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))
    # exact-Jaccard verification via joins on the persisted shingle frame.
    # The candidate table is output-bounded (≪ corpus), so AQE broadcasts
    # it and each join is one map-side pass over persisted sh — a
    # candidate-doc semi-join pre-filter would ADD a pass, not save one.
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        cand.join(sh.select(F.col("doc").alias("a"), "hg"), "a")
        .join(sh.select(F.col("doc").alias("b"), "hg"), ["b", "hg"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common
        .join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"), F.col("jaccard"))
    )
    return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))


# ------------------------------------------------------------------ simhash

def simhash64(col: Column, *, n: int = 2) -> Column:
    """64-bit SimHash of word n-grams, packed into a long, in ONE fold
    over the shingles: the accumulator is the array of 64 bit-votes.
    Bit j is set iff sum over shingles of sign(bit j of hash) > 0."""
    grams = word_ngrams(col, n)
    votes = F.aggregate(
        grams,
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda acc, g: F.zip_with(
            acc,
            F.array(*[
                F.when(
                    F.shiftright(F.xxhash64(g), j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
                for j in range(64)
            ]),
            lambda a, v: a + v,
        ),
    )
    packed = None
    for j in range(64):
        mask = (1 << j) if j < 63 else -(1 << 63)  # j=63: long sign bit
        bit = F.when(votes[j] > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return packed


def simhash64_df(df, text_col: str, id_col: str, *, n: int = 2,
                 hash_fn: str = "xxhash64"):
    """(doc, sh) simhash frame via explode → codegen hash → vote aggs —
    the scale path (same shape as minhash_signatures_df).

    ``hash_fn="md5"`` uses the 60-bit cross-engine hash (hash64_cross)
    so an external SQL oracle can recompute the identical simhash; the
    packed value then uses 60 bits instead of 64."""
    nbits = 64 if hash_fn == "xxhash64" else 60
    h = F.xxhash64("g") if hash_fn == "xxhash64" else hash64_cross(F.col("g"))
    ex = exploded_word_ngrams(df, text_col, id_col, n).select(
        "doc", h.alias("h")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{j}")
        for j in range(nbits)
    ]
    agg = ex.groupBy("doc").agg(*votes)
    packed = None
    for j in range(nbits):
        mask = (1 << j) if j < 63 else -(1 << 63)
        bit = F.when(F.col(f"v{j}") > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return agg.select("doc", packed.alias("sh"))


def simhash_pairs(table: Table, text_col: str, id_col: str, *,
                  n: int = 2, max_hamming: int = 3,
                  hash_fn: str = "xxhash64") -> Table:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Blocking by pigeonhole: split the hash bits into (max_hamming+1)
    chunks — any qualifying pair agrees on ≥1 chunk; join per chunk,
    verify exact hamming via bit_count(xor)."""
    nbits = 64 if hash_fn == "xxhash64" else 60
    chunks = max_hamming + 1
    width = nbits // chunks
    df = simhash64_df(
        table._df.select(F.col(id_col).alias("d"), F.col(text_col).alias("t")),
        "t", "d", n=n, hash_fn=hash_fn,
    )
    parts = df.select(
        "doc", "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright(F.col("sh"), i * width).bitwiseAND(
                    F.lit((1 << width) - 1)).alias("ck"),
            ) for i in range(chunks)
        ])).alias("p"),
    ).select("doc", "sh", "p.chunk", "p.ck")
    a = parts.select(F.col("doc").alias("a"), F.col("sh").alias("sha"), "chunk", "ck")
    b = parts.select(F.col("doc").alias("b"), F.col("sh").alias("shb"), "chunk", "ck")
    # SHUFFLE_HASH, not the planner's broadcast: with a broadcast join
    # the build side is a BroadcastExchange, so the expensive simhash
    # subtree (explode → window → distinct → md5 → 64 vote sums) is
    # computed TWICE — once per join side.  Forcing a shuffle join puts
    # an identical Exchange(chunk, ck) over both sides and Spark's
    # ReuseExchange computes the subtree once (guide §2.4/§3.1; plan
    # gate: tests/test_plans.py asserts the ReusedExchange)
    out = (
        a.join(b.hint("shuffle_hash"), ["chunk", "ck"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sha", "shb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"), "hamming")
    )
    return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))


# ------------------------------------------------------------------ embeddings

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Built-in-function cosine (F.zip_with/aggregate — JVM, no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# Fixed-point scale for the cross-engine embedding-LSH path: embeddings
# quantize to floor(x * 1e6) longs so every projection / dot product /
# norm is exact integer arithmetic — no float-sum ordering anywhere, so
# Spark and a SQL oracle agree bit-for-bit at any scale factor.
EMB_QUANT = 1_000_000


def hyperplane_band_keys(per_band: int, bands: int, proj) -> list[Column]:
    """Band bucket keys: band bi packs the sign bits of its `per_band`
    projections little-endian (`proj(p) -> Column` supplies projection
    p).  ONE definition shared by the batch cross-engine plan and the
    incremental operator — their bit-for-bit parity contract depends
    on identical packing."""
    return [
        sum([F.when(proj(bi * per_band + j) > 0, F.lit(1 << j))
             .otherwise(F.lit(0)) for j in range(per_band)],
            F.lit(0))
        for bi in range(bands)
    ]


def integer_cosine_gate(threshold: float, dot: Column,
                        na2: Column, nb2: Column) -> Column:
    """cos ≥ t over quantized integers: dot > 0 ∧ dot² ≥ t²·|a|²·|b|².
    dot² overflows BIGINT so the comparison runs in doubles — every
    input is an exact integer and the multiply SEQUENCE is fixed
    ((t²·na2)·nb2), so IEEE 754 gives the identical result in any
    engine.  Shared by the batch cross-engine plan, its DuckDB oracle
    mirror, and the incremental operator."""
    t2 = float(threshold) * float(threshold)
    dot_d = dot.cast("double")
    return (dot > 0) & (
        dot_d * dot_d >= (F.lit(t2) * na2.cast("double"))
        * nb2.cast("double"))


def plane_component_cross(p: int, i_col: Column) -> Column:
    """Deterministic hyperplane component c(p, i) ∈ [-1000, 1000]:
    md5(p*10007 + i) → 60-bit int → mod 2001 − 1000. SQL mirror:
    ``('0x'||substr(md5((p*10007+i)::VARCHAR),1,15))::BIGINT % 2001 - 1000``."""
    key = (F.lit(p * 10_007) + i_col).cast("string")
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return h % 2001 - 1000


def embedding_neardup_pairs(table: Table, vec_col: str, id_col: str, *,
                            threshold: float = 0.95, num_planes: int = 64,
                            bands: int = 4, exact: bool = False,
                            cross_engine: bool = False) -> Table:
    """Cosine near-duplicate pairs over `array<float>` embeddings.

    Scale path: random-hyperplane LSH — `num_planes` deterministic
    pseudo-random planes (hash-derived, seeded), sign bits grouped into
    `bands` bucket keys, candidates verified exactly. Band WIDTH
    (num_planes/bands sign bits) is the collision-control knob: on a
    clustered corpus 8-bit buckets collide massively (measured 6.8%
    of all pairs as candidates on the label-clustered embeddings
    fixture); the 16-bit default keeps candidates sparse while any-of-4
    bands holds recall ≈0.93 at cosine 0.99 (p=(1-θ/π)^16 per band). `exact=True`
    computes the O(n²) baseline instead (for validation / small inputs).

    ``cross_engine=True`` runs the SAME plan in fixed-point integer
    arithmetic (floor(x*1e6) quantization, md5-derived integer plane
    components, integer projections/dots/norms, threshold test via
    dot² ≥ t²·|a|²·|b|² on exact integers) so an external SQL engine
    reproduces the candidate set AND the verified pairs bit-for-bit —
    float-sum ordering never enters. Output pairs then carry no cosine
    column (the quantized cosine is a gate artifact, not the metric).
    """
    df = table._df.select(F.col(id_col).alias("vid"),
                          F.col(vec_col).cast("array<double>").alias("v"))
    if cross_engine:
        return _embedding_neardup_cross(df, threshold=threshold,
                                        num_planes=num_planes, bands=bands)
    if exact:
        return _embedding_neardup_exact_blocked(df, threshold=threshold)

    # scale path: explode vectors to (vid, i, x) rows; hyperplane
    # projections become map-side sum aggregates (codegen, no array
    # HOFs), and candidate verification is a dimension join — dot =
    # sum(xa*xb) — against precomputed norms. plane p component i =
    # hash(p*10007 + i) mapped to [-1, 1), computable per exploded row.
    def plane(p: int) -> Column:
        return (
            F.xxhash64(F.lit(p * 10_007) + F.col("i")) % 1_000_000 / 500_000.0 - 1.0
        )

    # lazy RDD localCheckpoints, not persist(): one materialization per
    # execution shared by all consumers, invisible to the CacheManager
    # (no cross-invocation reuse) — same rationale as ngram_jaccard_pairs
    ex = df.select("vid", F.posexplode("v").alias("i", "x")) \
        .localCheckpoint(eager=False)
    per_vec = ex.groupBy("vid").agg(
        *[F.sum(F.col("x") * plane(p)).alias(f"p{p}") for p in range(num_planes)],
    ).localCheckpoint(eager=False)
    per_band = num_planes // bands
    banded = per_vec.select(
        "vid",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[
                    (F.col(f"p{bi * per_band + j}") > 0).cast("int")
                    for j in range(per_band)
                ]).alias("bh"),
            ) for bi in range(bands)
        ])).alias("bb"),
    ).select("vid", "bb.band", "bb.bh")
    a = banded.select(F.col("vid").alias("a"), "band", "bh")
    b = banded.select(F.col("vid").alias("b"), "band", "bh")
    cand = (a.join(b, ["band", "bh"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    # fused norms (r12, same argument as brute_force_topk): every dim of
    # both vectors is present per (a, b) candidate group (dense
    # posexplode + inner dimension join), so Σxa² and Σxb² within the
    # group ARE the squared norms — the two norm re-attach joins (and
    # their exchanges) drop out of the verify stage, and per_vec no
    # longer needs to carry a norm column through its checkpoint.
    out = (
        cand.join(ex.select(F.col("vid").alias("a"), "i", F.col("x").alias("xa")), "a")
        .join(ex.select(F.col("vid").alias("b"), "i", F.col("x").alias("xb")), ["b", "i"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"),
             F.sum(F.col("xa") * F.col("xa")).alias("na2"),
             F.sum(F.col("xb") * F.col("xb")).alias("nb2"))
        .withColumn("cosine",
                    F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"), F.col("cosine"))
    )
    return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))


def _embedding_neardup_exact_blocked(df: DataFrame, *, threshold: float,
                                     block_size: int = 4096) -> Table:
    """Exact all-pairs cosine via blocked gram matrices.

    All-pairs is inherently O(n²) in comparisons, but the naive
    row-pair join evaluates an interpreted array fold per pair (no
    codegen for higher-order functions) — ~2M pairs took 39 s at
    sf0.1.  Instead: hash vectors into n/`block_size` blocks, pack each
    block into one row (collect_list of structs), self-join packed
    blocks on bi ≤ bj (stays distributed — no driver-side pair list),
    and compute each block-pair's gram matrix with one BLAS matmul
    inside mapInPandas.  Data movement drops from O(n²) joined
    rows to O(n²/block_size) replicated vectors, and the inner loop is
    vectorized float64.  Per-task memory is 2·block_size·dim·8 bytes
    (~4 MB at dim 64).  For corpora where even that is too much, the
    LSH path (exact=False) is the scale path; exact mode is the
    validation baseline, as in the reference's brute-force KNN
    (python/pathway/stdlib/ml/index.py).
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    n = df.count()
    nb = max(1, -(-n // block_size))
    packed = (
        df.select(
            F.pmod(F.xxhash64(F.col("vid").cast("string")), F.lit(nb)).alias("blk"),
            "vid", "v",
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vid", "v")).alias("rows"))
    )
    # alias-renamed self-join: every unordered block pair meets in
    # exactly ONE (bi ≤ bj) cell, so no downstream dedup is needed.
    # Each cell row carries both packed blocks (~2·block_size·dim·8 B);
    # repartitioning by cell keeps one-or-few cells per Arrow batch.
    pa = packed.select(F.col("blk").alias("bi"), F.col("rows").alias("rows_a"))
    pb = packed.select(F.col("blk").alias("bj"), F.col("rows").alias("rows_b"))
    # partition count == the number of (bi ≤ bj) cells, capped: the old
    # max(32, nb) floor scheduled 32 mapInPandas tasks even when there
    # was ONE cell — 31 empty Python-worker round trips per run (r11
    # stage metrics: 32 tasks, 12.4 s executorRunTime, 0.27 s CPU), and
    # the explicit count also pinned AQE.  A cell is the unsplittable
    # unit of gram work, so tasks beyond the cell count are pure
    # overhead; beyond the cap each task loops over a few cells.
    n_cells = nb * (nb + 1) // 2
    cells = (
        pa.join(pb, F.col("bi") <= F.col("bj"))
        .repartition(min(n_cells, 4096), "bi", "bj")
    )

    vid_type = df.schema["vid"].dataType
    out_schema = StructType([
        StructField("id_a", vid_type),
        StructField("id_b", vid_type),
        StructField("cosine", DoubleType()),
    ])
    thr = float(threshold)

    def gram(batches):
        for pdf in batches:
            for _, cell in pdf.iterrows():
                same = bool(cell["bi"] == cell["bj"])
                ra, rb = cell["rows_a"], cell["rows_b"]
                va = np.stack([r["v"] for r in ra]).astype(np.float64)
                vb = np.stack([r["v"] for r in rb]).astype(np.float64)
                ids_a = np.asarray([r["vid"] for r in ra])
                ids_b = np.asarray([r["vid"] for r in rb])
                va /= np.linalg.norm(va, axis=1, keepdims=True)
                vb /= np.linalg.norm(vb, axis=1, keepdims=True)
                G = va @ vb.T
                ii, jj = np.nonzero(G >= thr)
                ia, ib = ids_a[ii], ids_b[jj]
                keep = (ia < ib) if same else (ia != ib)
                ia, ib, cos = ia[keep], ib[keep], G[ii, jj][keep]
                yield pd.DataFrame({
                    "id_a": np.minimum(ia, ib),
                    "id_b": np.maximum(ia, ib),
                    "cosine": cos,
                })

    res = cells.mapInPandas(gram, out_schema)
    return Table(res.withColumn(ID, F.xxhash64("id_a", "id_b")))


def _embedding_neardup_cross(df: DataFrame, *, threshold: float,
                             num_planes: int, bands: int) -> Table:
    """Cross-engine (integer-exact) hyperplane-LSH near-dup. Same plan
    shape as the float path: explode → projection aggs → band bucket
    join → integer dot/norm verify. See embedding_neardup_pairs."""
    ex = df.select(
        "vid",
        F.posexplode("v").alias("i", "x"),
    ).select(
        "vid", "i",
        F.floor(F.col("x") * F.lit(1_000_000.0)).cast("long").alias("xi"),
    ).localCheckpoint(eager=False)
    # plane components depend only on (plane, dimension index): at most
    # num_planes × dim distinct values.  Evaluating the md5-derived
    # component expression per exploded row recomputed the identical
    # value |rows| × num_planes times (~8.2M md5+conv calls at sf0.1,
    # nearly all of the query's honest-from-parquet cost); build the
    # (i, c0..c63) table ONCE from the distinct dimension indexes
    # (dim × num_planes md5 calls) and broadcast-join it onto the
    # exploded rows.  Values are identical integers, so the candidate
    # set and verified pairs — and the SQL-mirror oracle — are
    # unchanged bit-for-bit.
    comp = F.broadcast(ex.select("i").distinct().select(
        "i", *[plane_component_cross(p, F.col("i")).alias(f"c{p}")
               for p in range(num_planes)]))
    # per-vector: integer norm² + one integer projection per plane.
    # xi ≤ ~1e6(+) and c ≤ 1000 so per-term ≤ 1e9; dims ≤ ~1e4 keeps the
    # sums far under 2^63.
    per_vec = ex.join(comp, "i").groupBy("vid").agg(
        *[F.sum(F.col("xi") * F.col(f"c{p}")).alias(f"p{p}")
          for p in range(num_planes)],
    ).localCheckpoint(eager=False)
    per_band = num_planes // bands
    band_keys = hyperplane_band_keys(per_band, bands,
                                     lambda p: F.col(f"p{p}"))
    banded = per_vec.select(
        "vid",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"), band_keys[bi].alias("bh"))
            for bi in range(bands)
        ])).alias("bb"),
    ).select("vid", "bb.band", "bb.bh")
    a = banded.select(F.col("vid").alias("a"), "band", "bh")
    b = banded.select(F.col("vid").alias("b"), "band", "bh")
    cand = (a.join(b, ["band", "bh"]).filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    # fused norms (r12): Σxa² / Σxb² within the (a, b) candidate group
    # equal the per-vector integer norms² EXACTLY (integer addition is
    # associative-commutative — no float caveat), so the two n2
    # re-attach joins drop out of the verify stage and per_vec no
    # longer carries n2 through its checkpoint.  The gate condition and
    # every value it reads are bit-identical, so the verified pair set
    # (and the SQL-mirror oracle) are unchanged.
    cond = integer_cosine_gate(threshold, F.col("dot"),
                               F.col("na2"), F.col("nb2"))
    out = (
        cand.join(ex.select(F.col("vid").alias("a"), "i", F.col("xi").alias("xa")), "a")
        .join(ex.select(F.col("vid").alias("b"), "i", F.col("xi").alias("xb")), ["b", "i"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"),
             F.sum(F.col("xa") * F.col("xa")).alias("na2"),
             F.sum(F.col("xb") * F.col("xb")).alias("nb2"))
        .filter(cond)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    )
    return Table(out.withColumn(ID, F.xxhash64("id_a", "id_b")))
