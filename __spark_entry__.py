"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2, each exercised through the pathway_spark Table/expression
API (never raw SQL), and ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL. Column names and float rounding are aligned on both sides so
the driver's order-insensitive value-hash comparison is exact.

Notes:
- ``events.ts`` is stored as nanosecond timestamps; Spark (with
  ``spark.sql.legacy.parquet.nanosAsLong``) reads LongType ns while
  DuckDB reads µs timestamps — all comparisons use integer epoch µs
  (Spark ``ts div 1000`` == DuckDB ``epoch_us(ts)``).
- Float outputs are engineered to be bit-identical across engines:
  money-style aggregates run in DECIMAL (exact, order-independent) and
  are cast to double at the end; per-row fp ops use identical inputs +
  identical op order. No ROUND anywhere — rounding doubles at the
  half-boundary is engine-dependent and would re-introduce divergence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import pathway_spark as pw
from pathway_spark import reducers as R
from pathway_spark import this
from pathway_spark.table import Table


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_PK = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _t(spark: SparkSession, sf_dir: str, name: str) -> Table:
    from pathway_spark.session import ensure_engine_confs

    # the driver may hand us its own session: apply runtime-settable
    # engine configs (ns-parquet reads, UTC, AQE) before the first scan
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # contract: events.ts is integer epoch nanoseconds (ts // 1000 ==
        # DuckDB epoch_us(ts)). The generated parquet stores either int64
        # ns (read as LongType via nanosAsLong) or timestamp[us] — accept
        # both. TIMESTAMP_NTZ → TIMESTAMP is identity under the pinned
        # UTC session timezone.
        if dict(df.dtypes)["ts"].startswith("timestamp"):
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
    return Table.from_spark(df, id_columns=_PK[name])


def _r(df: DataFrame, spec: dict[str, int]) -> DataFrame:
    """Cast named numeric columns to double (decimal-exact aggregates
    become bit-identical doubles on both engines). No rounding: rounding
    doubles is engine-dependent at the half-boundary, while our decimal
    pipeline already guarantees bit equality."""
    return df.withColumns({c: F.col(c).cast("double") for c in spec})


# ---------------------------------------------------------------------------
# entry — flagship query (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pricing-summary + join pipeline on sf0.001."""
    return q03_join_agg(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational core (SURVEY §2.2, §2.4)
# ---------------------------------------------------------------------------


def q01_filter_groupby(spark, sf):
    """TPC-H Q1 shape: filter → groupby → sum/avg/count reducers.

    Money sums are aggregated in DECIMAL so the result is exact (fp
    summation order would otherwise diverge between engines at 100 TB —
    and between Spark partitionings of the same data).
    """
    from pyspark.sql import types as T

    li = _t(spark, sf, "lineitem")
    dec_price = pw.cast(T.DecimalType(12, 2), this.l_extendedprice)
    dec_disc = pw.cast(T.DecimalType(4, 2), this.l_discount)
    out = (
        li.filter(this.l_quantity > 5)
        .groupby(this.l_returnflag, this.l_linestatus)
        .reduce(
            this.l_returnflag,
            this.l_linestatus,
            sum_qty=R.sum(this.l_quantity),
            sum_base_price=R.sum(dec_price),
            sum_disc_price=R.sum(dec_price * (1 - dec_disc)),
            avg_qty=R.sum(this.l_quantity) / R.count(),
            avg_disc=pw.cast(float, R.sum(dec_disc)) / R.count(),
            count_order=R.count(),
        )
    )
    return _r(out.to_df(), {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2,
                            "avg_qty": 4, "avg_disc": 6})


def q02_project_ifelse(spark, sf):
    """select + arithmetic + if_else + coalesce (rowwise expressions)."""
    from pyspark.sql import types as T

    li = _t(spark, sf, "lineitem")
    dec_price = pw.cast(T.DecimalType(12, 2), this.l_extendedprice)
    dec_disc = pw.cast(T.DecimalType(4, 2), this.l_discount)
    out = li.select(
        this.l_orderkey,
        this.l_linenumber,
        revenue=dec_price * (1 - dec_disc),
        heavy=pw.if_else(this.l_quantity >= 25, "heavy", "light"),
        qmod=this.l_quantity % 7,
    )
    return _r(out.to_df(), {"revenue": 2, "qmod": 2})


def q03_join_agg(spark, sf):
    """customer ⋈ orders ⋈ lineitem → revenue by market segment.

    Broadcast-friendly: customer is the small side at any SF where it
    fits (dim-style); the big join orders⋈lineitem shuffles on orderkey.
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    j1 = o.join(c, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.c_mktsegment
    )
    j2 = li.join(j1, pw.left.l_orderkey == pw.right.o_orderkey)
    from pyspark.sql import types as T

    dec_price = pw.cast(T.DecimalType(12, 2), pw.left.l_extendedprice)
    dec_disc = pw.cast(T.DecimalType(4, 2), pw.left.l_discount)
    out = j2.groupby(pw.right.c_mktsegment).reduce(
        mktsegment=pw.right.c_mktsegment,
        revenue=R.sum(dec_price * (1 - dec_disc)),
        n_items=R.count(),
    )
    return _r(out.to_df(), {"revenue": 2})


def q04_left_join(spark, sf):
    """nation left-join customer → per-nation customer count (zeros kept)."""
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    j = n.join_left(c, pw.left.n_nationkey == pw.right.c_nationkey)
    from pyspark.sql import types as T

    out = j.groupby(pw.left.n_name).reduce(
        n_name=pw.left.n_name,
        n_customers=R.count(pw.right.c_custkey),
        total_acctbal=R.sum(pw.cast(T.DecimalType(12, 2), pw.right.c_acctbal)),
    )
    return _r(out.to_df(), {"total_acctbal": 2})


def q05_update_rows(spark, sf):
    """update_rows (upsert) — full-outer join + coalesce per column."""
    c = _t(spark, sf, "customer")
    base = c.filter(this.c_custkey % 3 != 0)
    patch = c.filter(this.c_custkey % 2 == 0).with_columns(
        c_acctbal=this.c_acctbal + 1000.0
    )
    out = base.update_rows(patch).select(
        this.c_custkey, this.c_name, this.c_acctbal
    )
    return _r(out.to_df(), {"c_acctbal": 2})


def q06_difference_anti(spark, sf):
    """difference (anti-join on key): customers with no orders."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    buyers = o.groupby(this.o_custkey).reduce(c_custkey=this.o_custkey)
    # re-key both to the customer key so set-ops align universes
    ck = c.with_id_from(this.c_custkey)
    bk = buyers.with_id_from(this.c_custkey)
    out = ck.difference(bk).select(this.c_custkey, this.c_name)
    return out.to_df()


def q07_intersect_semi(spark, sf):
    """intersect (semi-join on key): customers that did order."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    buyers = o.groupby(this.o_custkey).reduce(c_custkey=this.o_custkey)
    ck = c.with_id_from(this.c_custkey)
    bk = buyers.with_id_from(this.c_custkey)
    out = ck.intersect(bk).select(this.c_custkey, this.c_mktsegment)
    return out.to_df()


def q08_concat(spark, sf):
    """concat (disjoint union) of two filtered slices → counts by type."""
    e = _t(spark, sf, "events")
    a = e.filter(this.event_type == "click")
    b = e.filter(this.event_type == "purchase")
    from pyspark.sql import types as T

    out = a.concat(b).groupby(this.user_id).reduce(
        user_id=this.user_id,
        n=R.count(),
        total_value=R.sum(pw.cast(T.DecimalType(10, 2), this.value)),
    )
    return _r(out.to_df(), {"total_value": 2})


def q09_flatten_wordcount(spark, sf):
    """flatten (explode) — classic wordcount over documents."""
    d = _t(spark, sf, "documents")
    from pathway_spark.expressions import SparkFunc

    words = d.with_columns(
        word=SparkFunc("split", lambda c: F.split(c, r"\s+"), this.text)
    )
    out = (
        words.flatten(this.word)
        .groupby(this.word)
        .reduce(word=this.word, n=R.count())
    )
    return out.to_df()


def q10_groupby_argmax(spark, sf):
    """argmax/argmin reducers (min_by/max_by)."""
    o = _t(spark, sf, "orders")
    out = o.groupby(this.o_custkey).reduce(
        o_custkey=this.o_custkey,
        best_order=R.argmax(this.o_totalprice, this.o_orderkey),
        cheapest_order=R.argmin(this.o_totalprice, this.o_orderkey),
        max_price=R.max(this.o_totalprice),
    )
    return _r(out.to_df(), {"max_price": 2})


def q11_count_distinct(spark, sf):
    """count_distinct + unique-per-group shape."""
    c = _t(spark, sf, "customer")
    out = c.groupby(this.c_nationkey).reduce(
        c_nationkey=this.c_nationkey,
        n_segments=R.count_distinct(this.c_mktsegment),
        n_customers=R.count(),
        min_bal=R.min(this.c_acctbal),
        max_bal=R.max(this.c_acctbal),
    )
    return _r(out.to_df(), {"min_bal": 2, "max_bal": 2})


def q12_sorted_tuple(spark, sf):
    """sorted_tuple reducer — rendered as a joined string for stable
    cross-engine hashing."""
    li = _t(spark, sf, "lineitem")
    grouped = li.groupby(this.l_orderkey).reduce(
        l_orderkey=this.l_orderkey,
        lines=R.sorted_tuple(this.l_linenumber),
    )
    out = grouped.to_df().select(
        "l_orderkey",
        F.array_join(F.col("lines").cast("array<string>"), ",").alias("lines"),
    )
    return out


def q13_ix_lookup(spark, sf):
    """ix — pointer lookup of customer row from events.user_id."""
    e = _t(spark, sf, "events")
    c = _t(spark, sf, "customer").with_id_from(this.c_custkey)
    looked = c.ix(c.pointer_from(this.user_id), context=e)
    # ix returns self's columns on context's universe; zip with context
    out = (e + looked).select(this.event_id, this.c_name, this.c_mktsegment)
    return out.to_df()


def q14_update_cells(spark, sf):
    """update_cells — overlay one column for a key subset."""
    c = _t(spark, sf, "customer")
    patch = c.filter(this.c_acctbal < 0).select(
        this.c_custkey, c_acctbal=pw.cast(float, 0.0)
    ).with_id_from(this.c_custkey)
    ck = c.with_id_from(this.c_custkey)
    out = ck.update_cells(patch).select(this.c_custkey, this.c_acctbal)
    return _r(out.to_df(), {"c_acctbal": 2})


def q15_sql_frontend(spark, sf):
    """pw.sql — SQL frontend over registered tables."""
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    out = pw.sql(
        """
        SELECT n.n_name AS n_name,
               COUNT(s.s_suppkey) AS n_suppliers,
               ROUND(SUM(s.s_acctbal), 2) AS total_bal
        FROM nation n JOIN supplier s ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
        """,
        nation=n,
        supplier=s,
    )
    return out.to_df()


# ---------------------------------------------------------------------------
# ordered / window-function operators (SURVEY §2.6)
# ---------------------------------------------------------------------------


def q16_sort_diff(spark, sf):
    """diff — value − previous value per user in ts order."""
    e = _t(spark, sf, "events")
    d = e.diff(this.ts, this.value, instance=this.user_id)
    out = d.select(this.event_id, this.user_id, this.diff_value)
    return _r(out.to_df(), {"diff_value": 2})


def q17_sort_prev_next(spark, sf):
    """sort — prev/next pointers become prev/next event ids (rendered
    through the natural key, not the hash, for oracle stability)."""
    e = _t(spark, sf, "events")
    from pyspark.sql import Window as W

    df = e._df
    w = W.partitionBy("user_id").orderBy("ts")
    out = df.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    )
    return out


def q18_interpolate(spark, sf):
    """interpolate — linear fill of NULL gaps in ts order."""
    e = _t(spark, sf, "events")
    sparse = e.with_columns(
        ts_us=this.ts // 1000,
        value=pw.if_else(this.event_id % 5 == 0, this.value, None),
    )
    out = pw.interpolate(sparse, this.ts_us, this.value)
    return _r(
        out.select(this.event_id, this.value).to_df(), {"value": 4}
    )


# ---------------------------------------------------------------------------
# temporal windows + joins (SURVEY §2.3, §2.5)
# ---------------------------------------------------------------------------

_US_H = 3_600_000_000  # µs per hour


def q19_tumbling(spark, sf):
    """windowby + tumbling — event counts per hour."""
    e = _t(spark, sf, "events")
    et = e.with_columns(ts_us=this.ts // 1000)
    wt = et.windowby(this.ts_us, window=pw.temporal.tumbling(_US_H))
    from pyspark.sql import types as T

    out = wt.reduce(
        window_start=this._pw_window_start,
        n=R.count(),
        total_value=R.sum(pw.cast(T.DecimalType(10, 2), this.value)),
    )
    return _r(out.to_df(), {"total_value": 2})


def q20_sliding(spark, sf):
    """windowby + sliding (1h windows hopping 30min) — rows fan out."""
    e = _t(spark, sf, "events")
    et = e.with_columns(ts_us=this.ts // 1000)
    wt = et.windowby(
        this.ts_us, window=pw.temporal.sliding(hop=_US_H // 2, duration=_US_H)
    )
    out = wt.reduce(window_start=this._pw_window_start, n=R.count())
    return out.to_df()


def q21_session(spark, sf):
    """windowby + session(max_gap=10min) per user."""
    e = _t(spark, sf, "events")
    et = e.with_columns(ts_us=this.ts // 1000)
    wt = et.windowby(
        this.ts_us,
        window=pw.temporal.session(max_gap=600_000_000),
        instance=this.user_id,
    )
    out = wt.reduce(
        user_id=this._pw_instance,
        session_start=this._pw_window_start,
        n_events=R.count(),
    )
    return out.to_df()


def q22_asof_join(spark, sf):
    """asof_join — each click matched with the user's latest prior purchase."""
    e = _t(spark, sf, "events")
    clicks = e.filter(this.event_type == "click").with_columns(ts_us=this.ts // 1000)
    buys = e.filter(this.event_type == "purchase").select(
        buyer=this.user_id, bts_us=this.ts // 1000, purchase_value=this.value
    )
    out = clicks.asof_join(
        buys,
        pw.left.ts_us,
        pw.right.bts_us,
        pw.left.user_id == pw.right.buyer,
        how="inner",
        direction="backward",
    ).select(this.event_id, this.user_id, this.purchase_value)
    return _r(out.to_df(), {"purchase_value": 2})


def q23_interval_join(spark, sf):
    """interval_join — error events within 10min after each signup, same user."""
    e = _t(spark, sf, "events")
    sign = e.filter(this.event_type == "signup").select(
        su_user=this.user_id, su_ts=this.ts // 1000
    )
    errs = e.filter(this.event_type == "error").select(
        err_user=this.user_id, err_ts=this.ts // 1000, err_id=this.event_id
    )
    jr = pw.temporal.interval_join(
        errs,
        sign,
        this.err_ts,
        this.su_ts,
        (0, 600_000_000),
        [pw.left.err_user == pw.right.su_user],
    )
    out = jr.select(
        err_id=pw.left.err_id, su_user=pw.right.su_user, su_ts=pw.right.su_ts
    )
    return out.to_df()


def q24_window_join(spark, sf):
    """window_join — clicks × purchases in the same tumbling hour + user."""
    e = _t(spark, sf, "events")
    clicks = e.filter(this.event_type == "click").select(
        c_user=this.user_id, c_ts=this.ts // 1000, c_id=this.event_id
    )
    buys = e.filter(this.event_type == "purchase").select(
        b_user=this.user_id, b_ts=this.ts // 1000, b_id=this.event_id
    )
    jr = pw.temporal.window_join(
        clicks,
        buys,
        this.c_ts,
        this.b_ts,
        pw.temporal.tumbling(_US_H),
        [pw.left.c_user == pw.right.b_user],
    )
    out = jr.select(c_id=pw.left.c_id, b_id=pw.right.b_id, c_user=pw.left.c_user)
    return out.to_df()


def q25_earliest_latest(spark, sf):
    """earliest/latest reducers by event time."""
    e = _t(spark, sf, "events")
    out = e.groupby(this.user_id).reduce(
        user_id=this.user_id,
        first_type=R.earliest(this.event_type, this.ts),
        last_type=R.latest(this.event_type, this.ts),
        first_value=R.earliest(this.value, this.ts),
    )
    return _r(out.to_df(), {"first_value": 2})


# ---------------------------------------------------------------------------
# scalar function namespaces (SURVEY §2.8)
# ---------------------------------------------------------------------------


def q26_string_funcs(spark, sf):
    """expr.str.* namespace."""
    d = _t(spark, sf, "documents")
    out = d.select(
        this.doc_id,
        upper=this.text.str.upper(),
        tlen=this.text.str.len(),
        starts_the=this.text.str.startswith("the"),
        replaced=this.text.str.replace("data", "DATA"),
        sliced=this.text.str.slice(0, 10),
    )
    return out.to_df()


def q27_datetime_funcs(spark, sf):
    """expr.dt.* namespace on orders timestamps."""
    o = _t(spark, sf, "orders")
    out = o.select(
        this.o_orderkey,
        yr=this.o_orderdate.dt.year(),
        mo=this.o_orderdate.dt.month(),
        dy=this.o_orderdate.dt.day(),
        ym=this.o_orderdate.dt.strftime("%Y-%m"),
    )
    return out.to_df()


def q28_json_numeric(spark, sf):
    """JSON get + num namespace: parse props.k, aggregate."""
    e = _t(spark, sf, "events")
    from pathway_spark.expressions import SparkFunc

    k = SparkFunc(
        "json_k",
        lambda c: F.get_json_object(c, "$.k").cast("long"),
        this.props,
    )
    from pyspark.sql import types as T

    et = e.with_columns(k=k, absv=this.value.num.abs())
    out = et.groupby(this.event_type).reduce(
        event_type=this.event_type,
        sum_k=R.sum(this.k),
        avg_abs=pw.cast(float, R.sum(pw.cast(T.DecimalType(10, 2), this.absv)))
        / R.count(),
    )
    return _r(out.to_df(), {"avg_abs": 4})


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text)
# ---------------------------------------------------------------------------


def q29_dedup_exact(spark, sf):
    """exact dedup — canonical (min doc_id) row per distinct text."""
    from pathway_spark.operators.dedup import exact_dedup

    d = _t(spark, sf, "documents")
    out = exact_dedup(d, "text", "doc_id")
    return out.to_df().select("doc_id", "text", "_pw_dup_count")


def q30_dup_pairs(spark, sf):
    """exact duplicate pair table (canonical_id, dup_id)."""
    from pathway_spark.operators.dedup import exact_dup_groups

    d = _t(spark, sf, "documents")
    return exact_dup_groups(d, "text", "doc_id").to_df()


def q31_ngram_jaccard(spark, sf):
    """exact 3-gram Jaccard near-dup pairs (inverted-index join)."""
    from pathway_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf, "documents")
    out = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.4)
    return out.to_df()


def q32_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup candidates, exact-verified (no SQL oracle —
    minhash seeds are engine-specific; rows-only check)."""
    from pathway_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf, "documents")
    out = minhash_lsh_pairs(d, "text", "doc_id", n=3, num_hashes=64,
                            bands=16, threshold=0.4)
    return out.to_df()


def q33_simhash(spark, sf):
    """SimHash hamming≤6 near-dup pairs (rows-only check)."""
    from pathway_spark.operators.dedup import simhash_pairs

    d = _t(spark, sf, "documents")
    return simhash_pairs(d, "text", "doc_id", n=2, max_hamming=6).to_df()


def q34_knn_bruteforce(spark, sf):
    """brute-force cosine top-k similarity search."""
    from pathway_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(this.vec_id < 10)
    out = brute_force_topk(emb, queries, vec_col="embedding",
                           id_col="vec_id", k=5)
    return out.to_df().select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


def q35_embedding_neardup(spark, sf):
    """embedding cosine near-dup pairs (exact mode for oracle parity)."""
    from pathway_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf, "embeddings")
    out = embedding_neardup_pairs(emb, "embedding", "vec_id",
                                  threshold=0.99, exact=True)
    return out.to_df().select("id_a", "id_b")


def q36_token_stats(spark, sf):
    """text analysis — token/subword counts per document."""
    from pathway_spark.operators.text import subword_count, token_count

    d = _t(spark, sf, "documents")
    df = d.to_df().select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_count(F.col("text")).alias("n_subwords"),
    )
    return df


def q37_lang_quality(spark, sf):
    """text analysis — language ID + quality score (rows-only check:
    heuristic weights are engine-specific)."""
    from pathway_spark.operators.text import detect_language, quality_score

    d = _t(spark, sf, "documents")
    return d.to_df().select(
        "doc_id",
        detect_language(F.col("text")).alias("lang_detected"),
        quality_score(F.col("text")).alias("quality"),
    )


def q38_fingerprint(spark, sf):
    """winnowing fingerprint (rows-only: xxhash64-based)."""
    from pathway_spark.operators.text import fingerprint64

    d = _t(spark, sf, "documents")
    return d.to_df().select(
        "doc_id", fingerprint64(F.col("text")).alias("fp64")
    )


def q39_approx_distinct(spark, sf):
    """count_distinct_approximate (rows-only: HLL impls differ)."""
    e = _t(spark, sf, "events")
    out = e.groupby(this.event_type).reduce(
        event_type=this.event_type,
        approx_users=R.count_distinct_approximate(this.user_id, precision=14),
    )
    return out.to_df()


def q40_iterate(spark, sf):
    """pw.iterate — fixed-point min-label propagation (connected
    components) over a co-occurrence graph of users (same hour bucket)."""
    e = _t(spark, sf, "events")
    ns_per_h = F.lit(_US_H * 1000)
    # exact integer floor-div of ns timestamps (ns > 2^53: no doubles)
    bucket = (
        (F.col("ts") - F.pmod(F.col("ts"), ns_per_h)).cast("decimal(38,0)") / ns_per_h
    ).cast("long")
    df = e._df.select(F.col("user_id"), bucket.alias("bucket")).distinct()
    a, b = df.alias("a"), df.alias("b")
    edges = (
        a.join(b, "bucket")
        .select(F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst"))
        .distinct()
    )
    verts = Table(
        df.select(F.col("user_id").alias("v")).distinct().withColumn("comp", F.col("v"))
    )

    def step(state: Table) -> Table:
        sdf = state._df
        prop = (
            edges.join(sdf, edges["src"] == sdf["v"])
            .groupBy("dst")
            .agg(F.min("comp").alias("comp2"))
        )
        new = sdf.join(prop, sdf["v"] == prop["dst"], "left").select(
            sdf["v"],
            F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"),
        )
        return Table(new)

    result = pw.iterate(step, iteration_limit=30, state=verts)
    return result._df.select(F.col("v").alias("user_id"), F.col("comp").alias("component"))


# ---------------------------------------------------------------------------
# extended coverage (round 1 widening)
# ---------------------------------------------------------------------------


def q41_restrict(spark, sf):
    """restrict — orders of BUILDING-segment customers (semi on key)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    building = c.filter(this.c_mktsegment == "BUILDING").with_id_from(this.c_custkey)
    ok = o.with_id_from(this.o_custkey)
    out = ok.restrict(building).select(this.o_orderkey, this.o_custkey)
    return out.to_df()


def q42_udf(spark, sf):
    """pw.udf — vectorized python UDF in a projection."""

    @pw.udf
    def bucket(q: float) -> str:
        return "high" if q >= 30 else ("mid" if q >= 10 else "low")

    li = _t(spark, sf, "lineitem")
    out = (
        li.select(this.l_orderkey, this.l_linenumber, b=bucket(this.l_quantity))
    )
    return out.to_df()


def q43_intervals_over(spark, sf):
    """intervals_over — error-event stats around each signup time."""
    e = _t(spark, sf, "events")
    signups = e.filter(this.event_type == "signup").select(at_t=this.ts // 1000)
    errs = e.filter(this.event_type == "error").with_columns(ts_us=this.ts // 1000)
    wt = errs.windowby(
        this.ts_us,
        window=pw.temporal.intervals_over(
            at=signups, lower_bound=-600_000_000, upper_bound=600_000_000
        ),
    )
    out = wt.reduce(at_t=this._pw_window_start, n_errors=R.count())
    return out.to_df()


def q44_asof_now(spark, sf):
    """asof_now_join — batch collapses to equi-join on current state."""
    from pathway_spark.operators.asof import asof_now_join

    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    out = asof_now_join(o, c, pw.left.o_custkey == pw.right.c_custkey)
    return out.select(this.o_orderkey, this.c_name).to_df()


def q45_fuzzy_match(spark, sf):
    """fuzzy_match_tables — token-Jaccard similarity join, natural keys."""
    from pathway_spark.ml import fuzzy_match_tables

    d = _t(spark, sf, "documents")
    l = d.filter(this.doc_id < 50)
    r = d.filter((this.doc_id >= 50) & (this.doc_id < 100))
    m = fuzzy_match_tables(l, r, left_col="text", right_col="text", threshold=0.6)
    lmap = l._df.select(F.col("_pw_id").alias("left_id"), F.col("doc_id").alias("doc_a"))
    rmap = r._df.select(F.col("_pw_id").alias("right_id"), F.col("doc_id").alias("doc_b"))
    out = (
        m._df.join(lmap, "left_id").join(rmap, "right_id")
        .select("doc_a", "doc_b", F.col("score").cast("double").alias("score"))
    )
    return out


def q46_bm25(spark, sf):
    """BM25 retrieval over documents for two fixed queries."""
    from pathway_spark.indexing import tfidf_score

    d = _t(spark, sf, "documents")
    qs = Table(
        spark.createDataFrame(
            [(1, "spark table join"), (2, "data stream window")],
            "query_id long, query string",
        )
    )
    out = tfidf_score(d, qs, text_col="text", id_col="doc_id", k=10)
    return out.to_df().select(
        "query_id", "doc_id", F.col("rank").cast("long").alias("rank")
    )


def q47_dt_components(spark, sf):
    """dt namespace on ns-long event times (hour/minute/weekday/week)."""
    from pathway_spark.expressions import SparkFunc

    e = _t(spark, sf, "events")
    tsx = SparkFunc("to_ts", lambda c: F.timestamp_micros(c), this.ts // 1000)
    out = e.select(
        this.event_id,
        hr=tsx.dt.hour(),
        mi=tsx.dt.minute(),
        wd=tsx.dt.weekday(),
        wk=tsx.dt.week(),
    )
    return out.to_df()


def q48_str_search(spark, sf):
    """str namespace: count/find/rfind/removeprefix."""
    d = _t(spark, sf, "documents")
    out = d.select(
        this.doc_id,
        n_the=this.text.str.count("the"),
        p_data=this.text.str.find("data"),
        rp_data=this.text.str.rfind("data"),
        noprefix=this.text.str.removeprefix("the "),
    )
    return out.to_df()


def q49_concat_reindex(spark, sf):
    """concat_reindex — overlapping slices kept as duplicates."""
    c = _t(spark, sf, "customer")
    a = c.filter(this.c_custkey % 2 == 0)
    b = c.filter(this.c_custkey % 3 == 0)
    out = a.concat_reindex(b).select(this.c_custkey)
    return out.to_df()


def q50_deduplicate_method(spark, sf):
    """Table.deduplicate — one surviving row per distinct text
    (rows-only: the survivor is picked by engine-internal id order)."""
    d = _t(spark, sf, "documents")
    out = d.deduplicate(value=this.text)
    return out.to_df().select("text")


def q51_pagerank(spark, sf):
    """pagerank over the user co-occurrence graph (rows-only: iterative
    float ranks are engine-specific)."""
    from pathway_spark.operators.iterate import pagerank

    e = _t(spark, sf, "events")
    ns_per_h = F.lit(_US_H * 1000)
    bucket = (
        (F.col("ts") - F.pmod(F.col("ts"), ns_per_h)).cast("decimal(38,0)") / ns_per_h
    ).cast("long")
    df = e._df.select(F.col("user_id"), bucket.alias("bucket")).distinct()
    a, b = df.alias("a"), df.alias("b")
    edges = (
        a.join(b, "bucket")
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    out = pagerank(Table(edges), steps=5)
    return out._df.select(F.col("w").alias("user_id"), F.round("rank", 4).alias("rank"))


def q52_embedding_lsh(spark, sf):
    """embedding near-dup via random-hyperplane LSH (rows-only:
    candidate set is engine-specific; pairs are exact-verified)."""
    from pathway_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf, "embeddings")
    out = embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.99, num_planes=32, bands=4
    )
    return out.to_df().select("id_a", "id_b")


def q53_multimodal_features(spark, sf):
    """multimodal plumbing — binary column → mapInPandas feature extract
    (rows-only: the stub decoder is python-side)."""
    from pathway_spark.operators.multimodal import extract_features

    d = _t(spark, sf, "documents")
    media = Table(
        d._df.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
    )
    out = extract_features(media, dim=8)
    return out._df.select("media_id", F.round(F.element_at("features", 1), 6).alias("f0"))


def q54_join_right(spark, sf):
    """right join — all customers, with their order revenue if any."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    j = o.join_right(c, pw.left.o_custkey == pw.right.c_custkey)
    out = j.groupby(pw.right.c_custkey).reduce(
        c_custkey=pw.right.c_custkey,
        n_orders=R.count(pw.left.o_orderkey),
    )
    return out.to_df()


def q55_unique_any(spark, sf):
    """unique + any reducers — per-order values that are single-valued."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    j = li.join(o, pw.left.l_orderkey == pw.right.o_orderkey)
    out = j.groupby(pw.left.l_orderkey).reduce(
        l_orderkey=pw.left.l_orderkey,
        status=R.unique(pw.right.o_orderstatus),
        some_flag=R.any(pw.left.l_returnflag),
    )
    return out.to_df()


def q56_interval_join_ts(spark, sf):
    """interval_join on real timestamps with timedelta bounds —
    lineitems shipped within 30 days of their order's date."""
    import datetime as dt

    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    jr = pw.temporal.interval_join(
        li,
        o,
        pw.left.l_shipdate,
        pw.right.o_orderdate,
        (dt.timedelta(0), dt.timedelta(days=30)),
        [pw.left.l_orderkey == pw.right.o_orderkey],
    )
    out = jr.groupby(pw.right.o_orderkey).reduce(
        o_orderkey=pw.right.o_orderkey, n_quick=R.count()
    )
    return out.to_df()


def q57_asof_left(spark, sf):
    """asof_join_left — every click, with latest prior purchase if any."""
    e = _t(spark, sf, "events")
    clicks = e.filter(this.event_type == "click").with_columns(ts_us=this.ts // 1000)
    buys = e.filter(this.event_type == "purchase").select(
        buyer=this.user_id, bts_us=this.ts // 1000, purchase_value=this.value
    )
    out = clicks.asof_join_left(
        buys, pw.left.ts_us, pw.right.bts_us, pw.left.user_id == pw.right.buyer
    ).select(this.event_id, this.purchase_value)
    return out.to_df()


def q58_try_divide_fill(spark, sf):
    """NULL-error model: /0 poisons the cell to NULL; fill_error fills."""
    from pathway_spark.expressions import SparkFunc

    e = _t(spark, sf, "events")
    k = SparkFunc(
        "json_k", lambda c: F.get_json_object(c, "$.k").cast("long"), this.props
    )
    et = e.with_columns(kmod=k % 3)
    out = et.select(
        this.event_id,
        ratio=pw.fill_error(this.value / this.kmod, -1.0),
    )
    return out.to_df()


def q59_dt_durations(spark, sf):
    """duration accessors on ns longs — event age vs epoch in units."""
    e = _t(spark, sf, "events")
    out = e.select(
        this.event_id,
        age_s=this.ts.dt.seconds(),
        age_min=this.ts.dt.minutes(),
        age_h=this.ts.dt.hours(),
        age_d=this.ts.dt.days(),
    )
    return out.to_df()


def q60_window_join_left(spark, sf):
    """window_join left — clicks kept even with no same-hour purchase."""
    e = _t(spark, sf, "events")
    clicks = e.filter(this.event_type == "click").select(
        c_user=this.user_id, c_ts=this.ts // 1000, c_id=this.event_id
    )
    buys = e.filter(this.event_type == "purchase").select(
        b_user=this.user_id, b_ts=this.ts // 1000, b_id=this.event_id
    )
    jr = pw.temporal.window_join(
        clicks, buys, this.c_ts, this.b_ts, pw.temporal.tumbling(_US_H),
        [pw.left.c_user == pw.right.b_user], how="left",
    )
    out = jr.select(c_id=pw.left.c_id, b_id=pw.right.b_id)
    return out.to_df()


def q61_session_predicate(spark, sf):
    """session(predicate=...) — merge a user's run of events while value
    is non-decreasing."""
    e = _t(spark, sf, "events")
    et = e.with_columns(ts_us=this.ts // 1000)
    wt = et.windowby(
        this.ts_us,
        window=pw.temporal.session(predicate=lambda prev, cur: cur.value >= prev.value),
        instance=this.user_id,
    )
    out = wt.reduce(
        user_id=this._pw_instance,
        session_start=this._pw_window_start,
        n_events=R.count(),
    )
    return out.to_df()


def q62_split_documents(spark, sf):
    """document splitter — 20-token chunks, one row per chunk."""
    from pathway_spark.ml.splitters import split_documents

    d = _t(spark, sf, "documents")
    out = split_documents(d, text_col="text", max_tokens=20, overlap=0)
    return out.to_df().select("doc_id", "chunk_pos", "chunk_text")


def q64_dt_round(spark, sf):
    """dt.floor / dt.round to hour granularity on order dates."""
    o = _t(spark, sf, "orders")
    out = o.select(
        this.o_orderkey,
        fl_day=this.o_orderdate.dt.floor("D").dt.strftime("%Y-%m-%d"),
        rd_hour=this.o_orderdate.dt.round("h").dt.strftime("%Y-%m-%d %H:%M"),
    )
    return out.to_df()


def q65_tuple_sort_by(spark, sf):
    """groupby(sort_by=) + ordered tuple reducer — deterministic order."""
    li = _t(spark, sf, "lineitem")
    grouped = li.groupby(this.l_orderkey, sort_by=this.l_linenumber).reduce(
        this.l_orderkey,
        flags=R.tuple(this.l_returnflag),
    )
    out = grouped.to_df().select(
        "l_orderkey", F.array_join("flags", ",").alias("flags")
    )
    return out


def q63_salted_agg(spark, sf):
    """skew-safe two-phase salted aggregation == plain GROUP BY result."""
    from pyspark.sql import types as T

    from pathway_spark.operators.skew import salted_aggregate

    e = _t(spark, sf, "events")
    et = e.with_columns(vdec=pw.cast(T.DecimalType(10, 2), this.value))
    out = salted_aggregate(
        et, ["user_id"],
        {"total": ("sum", "vdec"), "n": ("count", "vdec"),
         "lo": ("min", "value"), "hi": ("max", "value")},
        salt_buckets=16,
    )
    return _r(out.to_df(), {"total": 2})


def q66_tpch5_shape(spark, sf):
    """TPC-H Q5 shape: 5-way join (region→nation→customer→orders→
    lineitem) with local-supplier condition, revenue by nation."""
    from pyspark.sql import types as T

    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")

    nr = n.join(r, pw.left.n_regionkey == pw.right.r_regionkey).filter(
        pw.right.r_name == "ASIA"
    ).select(this.n_nationkey, this.n_name)
    cn = c.join(nr, pw.left.c_nationkey == pw.right.n_nationkey).select(
        this.c_custkey, this.n_name, this.c_nationkey
    )
    oc = o.join(cn, pw.left.o_custkey == pw.right.c_custkey).select(
        this.o_orderkey, this.n_name, this.c_nationkey
    )
    ls = li.join(s, pw.left.l_suppkey == pw.right.s_suppkey).select(
        this.l_orderkey, this.l_extendedprice, this.l_discount, this.s_nationkey
    )
    j = ls.join(oc, pw.left.l_orderkey == pw.right.o_orderkey).filter(
        pw.left.s_nationkey == pw.right.c_nationkey  # local supplier
    )
    dec_price = pw.cast(T.DecimalType(12, 2), pw.left.l_extendedprice)
    dec_disc = pw.cast(T.DecimalType(4, 2), pw.left.l_discount)
    out = j.groupby(pw.right.n_name).reduce(
        n_name=pw.right.n_name,
        revenue=R.sum(dec_price * (1 - dec_disc)),
        n_items=R.count(),
    )
    return _r(out.to_df(), {"revenue": 2})


def q67_semijoin_exists(spark, sf):
    """TPC-H Q4 shape: order-priority count for orders having at least
    one line shipped after the order date (EXISTS → semi-join)."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    late = li.join(o, pw.left.l_orderkey == pw.right.o_orderkey).filter(
        pw.left.l_shipdate > pw.right.o_orderdate
    ).select(o_orderkey=pw.right.o_orderkey)
    ok = o.with_id_from(this.o_orderkey)
    lk = late.with_id_from(this.o_orderkey)
    out = ok.intersect(lk).groupby(this.o_orderpriority).reduce(
        this.o_orderpriority, order_count=R.count()
    )
    return out.to_df()


def q68_count_distribution(spark, sf):
    """TPC-H Q13 shape: distribution of customers by order count
    (left join + two-level aggregation)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    j = c.join_left(o, pw.left.c_custkey == pw.right.o_custkey)
    per_cust = j.groupby(pw.left.c_custkey).reduce(
        c_custkey=pw.left.c_custkey,
        c_count=R.count(pw.right.o_orderkey),
    )
    out = per_cust.groupby(this.c_count).reduce(
        c_count=this.c_count, custdist=R.count()
    )
    return out.to_df()


def q69_recursive_split(spark, sf):
    """RecursiveSplitter re-chunk: greedy 100-char packing of space-split
    pieces via prefix-sum window (xpacks.llm.splitters)."""
    from pathway_spark.xpacks.llm.splitters import RecursiveSplitter

    d = _t(spark, sf, "documents")
    out = RecursiveSplitter(chunk_size=100, separators=[" "])(
        d, text_col="text", id_col="doc_id")
    return out.to_df().select("doc_id", "chunk_pos", "chunk_text")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_filter_groupby": q01_filter_groupby,
        "q02_project_ifelse": q02_project_ifelse,
        "q03_join_agg": q03_join_agg,
        "q04_left_join": q04_left_join,
        "q05_update_rows": q05_update_rows,
        "q06_difference_anti": q06_difference_anti,
        "q07_intersect_semi": q07_intersect_semi,
        "q08_concat": q08_concat,
        "q09_flatten_wordcount": q09_flatten_wordcount,
        "q10_groupby_argmax": q10_groupby_argmax,
        "q11_count_distinct": q11_count_distinct,
        "q12_sorted_tuple": q12_sorted_tuple,
        "q13_ix_lookup": q13_ix_lookup,
        "q14_update_cells": q14_update_cells,
        "q15_sql_frontend": q15_sql_frontend,
        "q16_sort_diff": q16_sort_diff,
        "q17_sort_prev_next": q17_sort_prev_next,
        "q18_interpolate": q18_interpolate,
        "q19_tumbling": q19_tumbling,
        "q20_sliding": q20_sliding,
        "q21_session": q21_session,
        "q22_asof_join": q22_asof_join,
        "q23_interval_join": q23_interval_join,
        "q24_window_join": q24_window_join,
        "q25_earliest_latest": q25_earliest_latest,
        "q26_string_funcs": q26_string_funcs,
        "q27_datetime_funcs": q27_datetime_funcs,
        "q28_json_numeric": q28_json_numeric,
        "q29_dedup_exact": q29_dedup_exact,
        "q30_dup_pairs": q30_dup_pairs,
        "q31_ngram_jaccard": q31_ngram_jaccard,
        "q32_minhash_lsh": q32_minhash_lsh,
        "q33_simhash": q33_simhash,
        "q34_knn_bruteforce": q34_knn_bruteforce,
        "q35_embedding_neardup": q35_embedding_neardup,
        "q36_token_stats": q36_token_stats,
        "q37_lang_quality": q37_lang_quality,
        "q38_fingerprint": q38_fingerprint,
        "q39_approx_distinct": q39_approx_distinct,
        "q40_iterate": q40_iterate,
        "q41_restrict": q41_restrict,
        "q42_udf": q42_udf,
        "q43_intervals_over": q43_intervals_over,
        "q44_asof_now": q44_asof_now,
        "q45_fuzzy_match": q45_fuzzy_match,
        "q46_bm25": q46_bm25,
        "q47_dt_components": q47_dt_components,
        "q48_str_search": q48_str_search,
        "q49_concat_reindex": q49_concat_reindex,
        "q50_deduplicate_method": q50_deduplicate_method,
        "q51_pagerank": q51_pagerank,
        "q52_embedding_lsh": q52_embedding_lsh,
        "q53_multimodal_features": q53_multimodal_features,
        "q54_join_right": q54_join_right,
        "q55_unique_any": q55_unique_any,
        "q56_interval_join_ts": q56_interval_join_ts,
        "q57_asof_left": q57_asof_left,
        "q58_try_divide_fill": q58_try_divide_fill,
        "q59_dt_durations": q59_dt_durations,
        "q60_window_join_left": q60_window_join_left,
        "q61_session_predicate": q61_session_predicate,
        "q62_split_documents": q62_split_documents,
        "q63_salted_agg": q63_salted_agg,
        "q64_dt_round": q64_dt_round,
        "q65_tuple_sort_by": q65_tuple_sort_by,
        "q66_tpch5_shape": q66_tpch5_shape,
        "q67_semijoin_exists": q67_semijoin_exists,
        "q68_count_distribution": q68_count_distribution,
        "q69_recursive_split": q69_recursive_split,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_filter_groupby": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                       AS sum_disc_price,
                   SUM(l_quantity) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
                       AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_quantity > 5
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_project_ifelse": """
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
                   CASE WHEN l_quantity >= 25 THEN 'heavy' ELSE 'light' END AS heavy,
                   CAST(l_quantity AS DOUBLE) - FLOOR(l_quantity / 7) * 7 AS qmod
            FROM lineitem
        """,
        "q03_join_agg": """
            SELECT c.c_mktsegment AS mktsegment,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                                  * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "q04_left_join": """
            SELECT n.n_name AS n_name,
                   COUNT(c.c_custkey) AS n_customers,
                   CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       AS total_acctbal
            FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
            GROUP BY n.n_name
        """,
        "q05_update_rows": """
            WITH base AS (
                SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
            ), patch AS (
                SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
                FROM customer WHERE c_custkey % 2 = 0
            )
            SELECT COALESCE(p.c_custkey, b.c_custkey) AS c_custkey,
                   COALESCE(p.c_name, b.c_name) AS c_name,
                   COALESCE(p.c_acctbal, b.c_acctbal) AS c_acctbal
            FROM base b FULL OUTER JOIN patch p USING (c_custkey)
        """,
        "q06_difference_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q07_intersect_semi": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "q08_concat": """
            SELECT user_id, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        """,
        "q09_flatten_wordcount": """
            SELECT w.word AS word, COUNT(*) AS n
            FROM documents d, UNNEST(regexp_split_to_array(d.text, '\\s+')) AS w(word)
            GROUP BY w.word
        """,
        "q10_groupby_argmax": """
            SELECT o_custkey,
                   ARG_MAX(o_orderkey, o_totalprice) AS best_order,
                   ARG_MIN(o_orderkey, o_totalprice) AS cheapest_order,
                   MAX(o_totalprice) AS max_price
            FROM orders GROUP BY o_custkey
        """,
        "q11_count_distinct": """
            SELECT c_nationkey,
                   COUNT(DISTINCT c_mktsegment) AS n_segments,
                   COUNT(*) AS n_customers,
                   MIN(c_acctbal) AS min_bal,
                   MAX(c_acctbal) AS max_bal
            FROM customer GROUP BY c_nationkey
        """,
        "q12_sorted_tuple": """
            SELECT l_orderkey,
                   STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "q13_ix_lookup": """
            SELECT e.event_id, c.c_name, c.c_mktsegment
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
        "q14_update_cells": """
            SELECT c_custkey,
                   CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal
            FROM customer
        """,
        "q15_sql_frontend": """
            SELECT n.n_name AS n_name,
                   COUNT(s.s_suppkey) AS n_suppliers,
                   ROUND(SUM(s.s_acctbal), 2) AS total_bal
            FROM nation n JOIN supplier s ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name
        """,
        "q16_sort_diff": """
            SELECT event_id, user_id,
                   value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS diff_value
            FROM events
        """,
        "q17_sort_prev_next": """
            SELECT event_id, user_id,
                   LAG(event_id)  OVER (PARTITION BY user_id ORDER BY ts) AS prev_event,
                   LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts) AS next_event
            FROM events
        """,
        "q18_interpolate": """
            WITH sparse AS (
                SELECT event_id, epoch_us(ts) AS t,
                       CASE WHEN event_id % 5 = 0 THEN value END AS value
                FROM events
            ), n AS (
                SELECT event_id, t, value,
                       LAST_VALUE(value IGNORE NULLS) OVER
                           (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                       LAST_VALUE(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER
                           (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
                       FIRST_VALUE(value IGNORE NULLS) OVER
                           (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                       FIRST_VALUE(CASE WHEN value IS NOT NULL THEN t END IGNORE NULLS) OVER
                           (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
                FROM sparse
            )
            SELECT event_id,
                   CASE
                       WHEN value IS NOT NULL THEN value
                       WHEN pv IS NULL THEN nv
                       WHEN nv IS NULL THEN pv
                       ELSE pv + (nv - pv) * (t - pt) / NULLIF(nt - pt, 0)
                   END AS value
            FROM n
        """,
        "q19_tumbling": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
            FROM events GROUP BY 1
        """,
        "q20_sliding": """
            WITH hops AS (
                SELECT e.event_id,
                       (epoch_us(e.ts) // 1800000000) * 1800000000 - k.k * 1800000000
                           AS window_start
                FROM events e, UNNEST([0, 1]) AS k(k)
                WHERE (epoch_us(e.ts) // 1800000000) * 1800000000 - k.k * 1800000000
                      + 3600000000 > epoch_us(e.ts)
            )
            SELECT window_start, COUNT(*) AS n FROM hops GROUP BY window_start
        """,
        "q21_session": """
            WITH t AS (
                SELECT user_id, epoch_us(ts) AS t,
                       CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY epoch_us(ts)) > 600000000
                            OR LAG(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
            ), s AS (
                SELECT user_id, t,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
                FROM t
            )
            SELECT user_id, MIN(t) AS session_start, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        "q22_asof_join": """
            SELECT c.event_id, c.user_id, b.value AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
            ON c.user_id = b.user_id AND epoch_us(c.ts) >= epoch_us(b.ts)
        """,
        "q23_interval_join": """
            SELECT e.event_id AS err_id, s.user_id AS su_user, epoch_us(s.ts) AS su_ts
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            JOIN (SELECT * FROM events WHERE event_type = 'signup') s
            ON e.user_id = s.user_id
               AND epoch_us(e.ts) >= epoch_us(s.ts)
               AND epoch_us(e.ts) <= epoch_us(s.ts) + 600000000
        """,
        "q24_window_join": """
            SELECT c.event_id AS c_id, b.event_id AS b_id, c.user_id AS c_user
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
            ON c.user_id = b.user_id
               AND epoch_us(c.ts) // 3600000000 = epoch_us(b.ts) // 3600000000
        """,
        "q25_earliest_latest": """
            SELECT user_id,
                   ARG_MIN(event_type, ts) AS first_type,
                   ARG_MAX(event_type, ts) AS last_type,
                   ARG_MIN(value, ts) AS first_value
            FROM events GROUP BY user_id
        """,
        "q26_string_funcs": """
            SELECT doc_id, UPPER(text) AS upper, LENGTH(text) AS tlen,
                   STARTS_WITH(text, 'the') AS starts_the,
                   REPLACE(text, 'data', 'DATA') AS replaced,
                   SUBSTRING(text, 1, 10) AS sliced
            FROM documents
        """,
        "q27_datetime_funcs": """
            SELECT o_orderkey,
                   CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
                   CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
                   CAST(DAY(o_orderdate) AS BIGINT) AS dy,
                   STRFTIME(o_orderdate, '%Y-%m') AS ym
            FROM orders
        """,
        "q28_json_numeric": """
            SELECT event_type,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                       AS sum_k,
                   CAST(SUM(CAST(ABS(value) AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*)
                       AS avg_abs
            FROM events GROUP BY event_type
        """,
        "q29_dedup_exact": """
            WITH ranked AS (
                SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS canon,
                       COUNT(*) OVER (PARTITION BY text) AS _pw_dup_count
                FROM documents
            )
            SELECT doc_id, text, _pw_dup_count FROM ranked WHERE doc_id = canon
        """,
        "q30_dup_pairs": """
            WITH canon AS (
                SELECT text, MIN(doc_id) AS canonical_id, COUNT(*) AS n
                FROM documents GROUP BY text
            )
            SELECT c.canonical_id, d.doc_id AS dup_id
            FROM documents d JOIN canon c ON d.text = c.text
            WHERE c.n > 1 AND d.doc_id <> c.canonical_id
        """,
        "q31_ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(LOWER(TRIM(text)), '\\s+') AS ts
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       CASE WHEN len(ts) >= 3 THEN
                           list_distinct(list_transform(range(1, len(ts) - 1),
                               i -> array_to_string(ts[i:i+2], ' ')))
                       ELSE [] END AS gs
                FROM toks
            ), exploded AS (
                SELECT doc_id, g.g AS g FROM grams, UNNEST(gs) AS g(g)
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM exploded GROUP BY doc_id
            ), common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                FROM exploded a JOIN exploded b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.4
        """,
        "q34_knn_bruteforce": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       list_cosine_similarity(c.embedding, q.embedding) AS score
                FROM embeddings c CROSS JOIN q
                WHERE c.vec_id <> q.vec_id
            )
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, neighbor_id) AS rank
            FROM scored
            QUALIFY rank <= 5
        """,
        "q35_embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
        """,
        "q41_restrict": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """,
        "q42_udf": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_quantity >= 30 THEN 'high'
                        WHEN l_quantity >= 10 THEN 'mid'
                        ELSE 'low' END AS b
            FROM lineitem
        """,
        "q43_intervals_over": """
            WITH sign AS (
                SELECT DISTINCT epoch_us(ts) AS at_t FROM events
                WHERE event_type = 'signup'
            ), err AS (
                SELECT epoch_us(ts) AS t FROM events WHERE event_type = 'error'
            )
            SELECT s.at_t, COUNT(*) AS n_errors
            FROM sign s JOIN err e
              ON e.t >= s.at_t - 600000000 AND e.t <= s.at_t + 600000000
            GROUP BY s.at_t
        """,
        "q44_asof_now": """
            SELECT o.o_orderkey, c.c_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "q45_fuzzy_match": """
            WITH toks AS (
                SELECT doc_id,
                       list_distinct(regexp_split_to_array(LOWER(TRIM(text)), '\\s+')) AS ts
                FROM documents
            ), l AS (SELECT * FROM toks WHERE doc_id < 50),
               r AS (SELECT * FROM toks WHERE doc_id >= 50 AND doc_id < 100),
            le AS (SELECT doc_id, t.t AS t FROM l, UNNEST(ts) AS t(t)),
            re AS (SELECT doc_id, t.t AS t FROM r, UNNEST(ts) AS t(t)),
            common AS (
                SELECT le.doc_id AS doc_a, re.doc_id AS doc_b, COUNT(*) AS c
                FROM le JOIN re ON le.t = re.t
                GROUP BY le.doc_id, re.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(c AS DOUBLE) / (len(l.ts) + len(r.ts) - c) AS score
            FROM common
            JOIN l ON l.doc_id = doc_a
            JOIN r ON r.doc_id = doc_b
            WHERE CAST(c AS DOUBLE) / (len(l.ts) + len(r.ts) - c) >= 0.6
        """,
        "q46_bm25": """
            WITH toks AS (
                SELECT doc_id, t.t AS term
                FROM documents,
                     UNNEST(regexp_split_to_array(LOWER(TRIM(text)), '\\s+')) AS t(t)
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
            ), dl AS (
                SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
            ), stats AS (
                SELECT (SELECT COUNT(*) FROM documents) AS n,
                       (SELECT AVG(dl) FROM dl) AS avgdl
            ), dfreq AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), idf AS (
                SELECT term, LN((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
                FROM dfreq, stats
            ), q AS (
                SELECT * FROM (VALUES (1, 'spark'), (1, 'table'), (1, 'join'),
                                      (2, 'data'), (2, 'stream'), (2, 'window'))
                     AS v(query_id, term)
            ), scored AS (
                SELECT q.query_id, tf.doc_id,
                       SUM(idf.idf * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
                           AS score
                FROM q JOIN tf USING (term) JOIN idf USING (term)
                JOIN dl ON dl.doc_id = tf.doc_id, stats
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rank
            FROM scored QUALIFY rank <= 10
        """,
        "q47_dt_components": """
            SELECT event_id,
                   CAST(HOUR(ts) AS BIGINT) AS hr,
                   CAST(MINUTE(ts) AS BIGINT) AS mi,
                   CAST(ISODOW(ts) - 1 AS BIGINT) AS wd,
                   CAST(WEEKOFYEAR(ts) AS BIGINT) AS wk
            FROM events
        """,
        "q48_str_search": """
            SELECT doc_id,
                   CAST((LENGTH(text) - LENGTH(REPLACE(text, 'the', ''))) / 3 AS BIGINT)
                       AS n_the,
                   CAST(STRPOS(text, 'data') - 1 AS BIGINT) AS p_data,
                   CAST(CASE WHEN STRPOS(REVERSE(text), REVERSE('data')) = 0 THEN -1
                        ELSE LENGTH(text) - STRPOS(REVERSE(text), REVERSE('data'))
                             - LENGTH('data') + 1 END AS BIGINT) AS rp_data,
                   CASE WHEN STARTS_WITH(text, 'the ')
                        THEN SUBSTRING(text, 5) ELSE text END AS noprefix
            FROM documents
        """,
        "q49_concat_reindex": """
            SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
        """,
        "q54_join_right": """
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        """,
        "q55_unique_any": """
            SELECT l.l_orderkey,
                   MIN(o.o_orderstatus) AS status,
                   MIN(l.l_returnflag) AS some_flag
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY l.l_orderkey
        """,
        "q56_interval_join_ts": """
            SELECT o.o_orderkey, COUNT(*) AS n_quick
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY
            GROUP BY o.o_orderkey
        """,
        "q57_asof_left": """
            SELECT c.event_id, b.value AS purchase_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
            ON c.user_id = b.user_id AND epoch_us(c.ts) >= epoch_us(b.ts)
        """,
        "q58_try_divide_fill": """
            SELECT event_id,
                   CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 = 0
                        THEN -1.0
                        ELSE value / (CAST(json_extract_string(props, '$.k') AS BIGINT) % 3)
                   END AS ratio
            FROM events
        """,
        "q59_dt_durations": """
            SELECT event_id,
                   epoch_us(ts) // 1000000 AS age_s,
                   epoch_us(ts) // 60000000 AS age_min,
                   epoch_us(ts) // 3600000000 AS age_h,
                   epoch_us(ts) // 86400000000 AS age_d
            FROM events
        """,
        "q60_window_join_left": """
            SELECT c.event_id AS c_id, b.event_id AS b_id
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
            ON c.user_id = b.user_id
               AND epoch_us(c.ts) // 3600000000 = epoch_us(b.ts) // 3600000000
        """,
        "q61_session_predicate": """
            WITH t AS (
                SELECT user_id, epoch_us(ts) AS t, value,
                       CASE WHEN LAG(value) OVER w IS NULL
                                 OR value < LAG(value) OVER w
                       THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
            ), s AS (
                SELECT user_id, t,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
                FROM t
            )
            SELECT user_id, MIN(t) AS session_start, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        "q62_split_documents": """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS ts
                FROM documents
            )
            SELECT doc_id,
                   CAST(s.s // 20 AS INT) AS chunk_pos,
                   array_to_string(ts[s.s + 1 : s.s + 20], ' ') AS chunk_text
            FROM toks, UNNEST(range(0, GREATEST(len(ts), 1), 20)) AS s(s)
        """,
        "q63_salted_agg": """
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total,
                   COUNT(value) AS n,
                   MIN(value) AS lo,
                   MAX(value) AS hi
            FROM events GROUP BY user_id
        """,
        "q64_dt_round": """
            SELECT o_orderkey,
                   STRFTIME(date_trunc('day', o_orderdate), '%Y-%m-%d') AS fl_day,
                   STRFTIME(to_timestamp((epoch_us(o_orderdate) + 1800000000)
                            // 3600000000 * 3600) AT TIME ZONE 'UTC',
                            '%Y-%m-%d %H:%M') AS rd_hour
            FROM orders
        """,
        "q65_tuple_sort_by": """
            SELECT l_orderkey,
                   STRING_AGG(l_returnflag, ',' ORDER BY l_linenumber, l_returnflag)
                       AS flags
            FROM lineitem GROUP BY l_orderkey
        """,
        "q66_tpch5_shape": """
            SELECT n.n_name AS n_name,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
            GROUP BY n.n_name
        """,
        "q67_semijoin_exists": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q68_count_distribution": """
            SELECT c_count, COUNT(*) AS custdist
            FROM (
                SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey
            ) GROUP BY c_count
        """,
        "q69_recursive_split": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS ts FROM documents
            ), pieces AS (
                SELECT doc_id, ts[p.p + 1] AS piece, p.p + 1 AS pos
                FROM toks, UNNEST(range(0, len(ts))) AS p(p)
            ), cums AS (
                SELECT doc_id, piece, pos,
                       LENGTH(piece) + 1 AS plen,
                       SUM(LENGTH(piece) + 1) OVER (
                           PARTITION BY doc_id ORDER BY pos) AS cum
                FROM pieces
            )
            SELECT doc_id,
                   CAST(FLOOR((cum - plen) / 100.0) AS INT) AS chunk_pos,
                   STRING_AGG(piece, ' ' ORDER BY pos) AS chunk_text
            FROM cums
            GROUP BY doc_id, chunk_pos
            HAVING LENGTH(STRING_AGG(piece, ' ' ORDER BY pos)) > 0
        """,
        "q40_iterate": """
            WITH RECURSIVE buckets AS (
                SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS bucket FROM events
            ), edges AS (
                SELECT DISTINCT a.user_id AS src, b.user_id AS dst
                FROM buckets a JOIN buckets b USING (bucket)
            ), reach AS (
                SELECT DISTINCT user_id AS v, user_id AS r FROM events
                UNION
                SELECT e.dst AS v, reach.r
                FROM reach JOIN edges e ON reach.v = e.src
            )
            SELECT v AS user_id, MIN(r) AS component FROM reach GROUP BY v
        """,
        "q36_token_stats": """
            SELECT doc_id,
                   CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
                   len(list_filter(regexp_split_to_array(LOWER(text), '[^a-z0-9_]+'),
                       x -> LENGTH(x) > 0)) AS n_subwords
            FROM documents
        """,
    }
