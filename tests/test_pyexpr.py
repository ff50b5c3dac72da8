"""Verified-Python expression evaluation on resident ticks (pyexpr.py,
r9 verdict #2).

The contract under test: for every supported Column-expression shape,
the compiled Python chain is BYTE-identical to the Catalyst fold; for
everything else compilation refuses (node keeps Catalyst); runtime
values outside the exact domain escape per-tick; a mismatch pins the
node to Catalyst forever and the Catalyst result is what flows on —
so a wrong compile can never corrupt output."""

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pathway_spark.streaming.pyexpr import (
    CompiledChain, PyEvalEscape, compile_fn)

SCH = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("j", T.IntegerType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("s", T.StringType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("_pw_diff", T.LongType()),
    T.StructField("_pw_time", T.LongType()),
])
COLS = [f.name for f in SCH.fields]

NAN, INF = float("nan"), float("inf")
ROWS = [
    (1, 5, 1.5, "Hello world", True, 1, 0),
    (2, -7, NAN, "", False, -1, 0),
    (None, None, None, None, None, 1, 1),
    (2**62, 2**31 - 1, -0.0, "a  b\tc", True, 1, 1),
    (-(2**62), -(2**31), INF, " x ", None, 1, 2),
    (7, 0, -INF, "MIXED case", False, 1, 2),
]


def _dual(spark, fn, rows=ROWS, expect_escape=False):
    from pathway_spark.streaming.resident import collect_rows

    cc = compile_fn(spark, fn, SCH)
    assert cc is not None, "expected fn to compile"
    df = fn(spark.createDataFrame(rows, SCH))
    srows = collect_rows(df)    # the engine's canonical row form
    if expect_escape:
        with pytest.raises(PyEvalEscape):
            cc.run(rows, COLS)
        return
    prows = cc.run(rows, COLS)
    assert [tuple(map(repr, r)) for r in prows] \
        == [tuple(map(repr, r)) for r in srows]
    assert cc.out_cols == df.columns


def test_arithmetic_and_doubles(spark):
    """Integer/double arithmetic, Java-sign %, NULL propagation —
    bit-identical to the Catalyst fold (non-overflowing rows; ANSI
    overflow is its own test)."""
    rows = [r for r in ROWS if (r[0] is None or abs(r[0]) < 2**40)
            and r[1] != 0]
    _dual(spark, lambda df: df.select(
        (F.col("i") * 3 + 7).alias("a"),
        (F.col("i") - F.col("j")).alias("b"),
        (F.col("d") * 2.0 + 0.1).alias("c"),
        (-F.col("i")).alias("n"),
        (F.col("i") % 5).alias("m"),
        (F.col("j") % -3).alias("m2"),
        (F.col("i") % F.col("j")).alias("m3"),
        "_pw_diff", "_pw_time"), rows=rows)


def test_ansi_overflow_escapes(spark):
    """Under ANSI (Spark 4 default) an overflowing row must ESCAPE to
    Catalyst (which raises Spark's own error) — never wrap silently."""
    cc = compile_fn(spark, lambda df: df.select(
        (F.col("i") * 3).alias("a"), "_pw_diff", "_pw_time"), SCH)
    assert cc is not None
    ok_rows = [(5, 1, 1.0, "x", True, 1, 0)]
    assert cc.run(ok_rows, COLS) == [(15, 1, 0)]
    bad = [(2**62, 1, 1.0, "x", True, 1, 0)]
    with pytest.raises(PyEvalEscape):
        cc.run(bad, COLS)


def test_comparisons_nan_and_3vl(spark):
    """Spark NaN ordering (NaN = NaN, NaN > everything), three-valued
    AND/OR, null-safe equality."""
    _dual(spark, lambda df: df.select(
        (F.col("d") > 0.0).alias("g"),
        (F.col("d") == F.lit(NAN)).alias("eqn"),
        (F.col("d") >= F.lit(INF)).alias("gei"),
        F.col("d").eqNullSafe(F.lit(None).cast("double")).alias("ns"),
        ((F.col("i") > 1) & (F.col("b"))).alias("a3"),
        ((F.col("b")) | F.col("s").isNotNull()).alias("o3"),
        (~F.col("b")).alias("nb"),
        "_pw_diff", "_pw_time"))


def test_filter_conditionals_strings(spark):
    _dual(spark, lambda df: (
        df.filter(F.col("_pw_diff") != 0)
          .select(
              F.when(F.col("i") > 1, F.lit("big"))
               .when(F.col("i").isNull(), F.lit("null"))
               .otherwise(F.lit("small")).alias("w"),
              F.coalesce(F.col("s"), F.lit("-")).alias("c"),
              F.length("s").alias("n"),
              F.concat(F.lit("["), F.col("s"), F.lit("]")).alias("k"),
              "_pw_diff", "_pw_time")))


def test_split_matches_java_semantics(spark):
    """\\s+ under re.ASCII == Java default \\s; leading/trailing empty
    fields follow Java split(limit=-1)."""
    rows = [(1, 1, 1.0, " lead and trail ", True, 1, 0),
            (2, 2, 2.0, "", False, 1, 0),
            (3, 3, 3.0, "one", True, 1, 0),
            (4, 4, 4.0, None, True, 1, 0),
            (5, 5, 5.0, "a,b;;c", True, 1, 0)]
    _dual(spark, lambda df: df.select(
        F.split(F.col("s"), r"\s+").alias("ws"),
        F.split(F.col("s"), r"[,;]").alias("cs"),
        "_pw_diff", "_pw_time"), rows=rows)


def test_randomized_property(spark):
    """200 random rows through a mixed expression — repr-exact."""
    rng = random.Random(1009)
    rows = []
    for k in range(200):
        rows.append((
            rng.choice([None, rng.randrange(-2**40, 2**40)]),
            rng.choice([None, rng.randrange(-2**31, 2**31 - 1)]),
            rng.choice([None, NAN, INF, -INF, -0.0,
                        rng.uniform(-1e9, 1e9)]),
            rng.choice([None, "", "x y", "a b  c", str(k)]),
            rng.choice([None, True, False]),
            rng.choice([1, -1]), k % 7))
    _dual(spark, lambda df: (
        df.filter((F.col("d") > -1e8) | F.col("i").isNotNull())
          .select((F.col("i") + 1).alias("a"),
                  (F.col("d") * -1.0).alias("b"),
                  F.split(F.col("s"), " ").alias("sp"),
                  (F.col("j") % 7).alias("m"),
                  "_pw_diff", "_pw_time")), rows=rows)


def test_lower_upper_ascii_gate(spark):
    _dual(spark, lambda df: df.select(
        F.lower("s").alias("lo"), F.upper("s").alias("up"),
        "_pw_diff", "_pw_time"))
    rows = [(1, 1, 1.0, "HÉLLO", True, 1, 0)]
    _dual(spark, lambda df: df.select(
        F.lower("s").alias("lo"), "_pw_diff", "_pw_time"),
        rows=rows, expect_escape=True)


def test_refusals(spark):
    """Outside the verified subset → None (node keeps Catalyst)."""
    cases = [
        lambda df: df.withColumn("r", F.rand()),
        lambda df: df.withColumn("x", F.regexp_replace("s", "a", "b")),
        lambda df: df.withColumn("x", F.col("i").cast("string")),
        lambda df: df.withColumn("x", F.split(F.col("s"), r"(a)")),
        lambda df: df.withColumn("x", F.split(F.col("s"), "é")),
        # bare '.': Java '.' excludes \r/NEL/LS/PS, Python '.' only \n
        lambda df: df.withColumn("x", F.split(F.col("s"), ".")),
        lambda df: df.withColumn("x", F.split(F.col("s"), "a.b")),
        # zero-width-matchable: Java emits a leading empty field
        lambda df: df.withColumn("x", F.split(F.col("s"), "a*")),
        lambda df: df.withColumn("x", F.split(F.col("s"), r"\s*")),
        lambda df: df.withColumn("x", F.split(F.col("s"), " ", 2)),
        lambda df: df.groupBy("s").count(),
        lambda df: df.withColumn("x", F.explode(F.split("s", " "))),
    ]
    for fn in cases:
        assert compile_fn(spark, fn, SCH) is None


# -- engine integration -----------------------------------------------------


def _wc_graph(spark, docs_tpl):
    from pyspark.sql import functions as SF
    from pathway_spark.streaming.differential import DifferentialGraph

    g = DifferentialGraph(spark)
    src = g.source("docs", docs_tpl.limit(0))
    out = (src
           .with_columns(__ws=SF.split(SF.col("text"), r"\s+"))
           .select(SF.col("doc_id"), SF.col("__ws"))
           .flatten("__ws", "w")
           .reduce(["w"], n=("count",)))
    return g, out


def _drain(spark, batches, *, resident=True, check_every=0, corrupt=None):
    docs_tpl = spark.createDataFrame([], "doc_id long, text string")
    g, out = _wc_graph(spark, docs_tpl)
    if not resident:
        g.resident = False
    traces = []
    states = []
    for i, rows in enumerate(batches):
        (d,) = g.step(out, docs=spark.createDataFrame(rows, docs_tpl.schema))
        traces.append(sorted(tuple(map(repr, r)) for r in d.collect()))
        eng = g._res_engine
        if eng is not None:
            if check_every:
                eng.PYEXPR_CHECK_EVERY = check_every
            if corrupt is not None and i == corrupt[0]:
                for ent in eng._pyexpr.values():
                    if ent["cc"] is not None:
                        corrupt[1](ent["cc"])
            states.append(tuple(sorted(eng.pyexpr_stats().items())))
    return traces, states, g


def test_engine_wordcount_pyexpr_on_and_equal(spark):
    """The wordcount chain flips on after PYEXPR_VERIFY_TICKS
    non-empty byte-matching ticks (r11), and the full trace equals
    the distributed run."""
    batches = [[(i, f"w{i % 3} common tok{i}")] for i in range(6)]
    a, states, g = _drain(spark, batches, resident=True)
    b, _, _ = _drain(spark, batches, resident=False)
    assert a == b
    stats = g._res_engine.pyexpr_stats()
    assert stats["on"] == 1 and stats["off"] == 0, stats


def test_engine_mismatch_injection_pins_catalyst(spark):
    """Corrupting the compiled chain mid-stream (debug check active)
    must pin the node to Catalyst and leave every emitted row correct
    (the Catalyst result flows on a mismatch)."""
    batches = [[(i, f"alpha beta{i}")] for i in range(6)]

    def corrupt(cc: CompiledChain):
        kind, fns = cc.ops[0]
        orig = fns[-1]
        fns[-1] = lambda r: ("WRONG",)
    a, states, g = _drain(spark, batches, resident=True,
                          check_every=1, corrupt=(3, corrupt))
    b, _, _ = _drain(spark, batches, resident=False)
    assert a == b                      # output never corrupted
    stats = g._res_engine.pyexpr_stats()
    assert stats["off"] == 1 and stats["on"] == 0, stats


def test_engine_escape_falls_back_per_tick(spark):
    """A non-ASCII document escapes to Catalyst for that tick only
    (inconclusive — does not count toward the verify floor); enough
    ascii ticks still flip the node on and the trace equals
    distributed."""
    batches = [[(1, "plain ascii words")],
               [(2, "unicode ÉCLAIR")],
               [(3, "back to ascii")],
               [(4, "more ascii here")],
               [(5, "and a final tick")]]
    a, states, g = _drain(spark, batches, resident=True)
    b, _, _ = _drain(spark, batches, resident=False)
    assert a == b
    assert g._res_engine.pyexpr_stats()["on"] == 1


def test_engine_thin_first_tick_does_not_flip_on(spark):
    """r11 hardening (r10 verdict flaw #1): ONE non-empty matching
    tick — even several, below the floor — must leave the node in
    "verify", still dual-running; and an all-NULL-text tick is as
    thin a witness as any other single tick."""
    from pathway_spark.streaming.resident import ResidentEngine

    assert ResidentEngine.PYEXPR_VERIFY_TICKS >= 2
    assert ResidentEngine.PYEXPR_CHECK_EVERY > 0   # production default

    for first in [(1, None)], [(1, "real words here")]:
        n = ResidentEngine.PYEXPR_VERIFY_TICKS - 1
        batches = [first] + [[(10 + i, f"tail w{i}")] for i in range(n - 1)]
        a, states, g = _drain(spark, batches, resident=True)
        b, _, _ = _drain(spark, batches, resident=False)
        assert a == b
        stats = g._res_engine.pyexpr_stats()
        assert stats["verify"] == 1 and stats["on"] == 0, stats

    # a bulk tick crossing PYEXPR_VERIFY_ROWS flips on immediately
    # (floor lowered so the batch stays under resident admission caps)
    old = ResidentEngine.PYEXPR_VERIFY_ROWS
    ResidentEngine.PYEXPR_VERIFY_ROWS = 40
    try:
        # first tick is never resident (warmup); the second carries
        # 50 rows >= the lowered floor in ONE verified tick
        bulk = [[(0, "warmup tick")],
                [(i, f"w{i % 5} common") for i in range(1, 51)]]
        a, states, g = _drain(spark, bulk, resident=True)
        b, _, _ = _drain(spark, bulk, resident=False)
        assert a == b
        assert g._res_engine.pyexpr_stats()["on"] == 1
    finally:
        ResidentEngine.PYEXPR_VERIFY_ROWS = old


def test_math_and_string_extensions(spark):
    """r10 second batch: Divide (ANSI-aware), Abs, Sqrt, Log/Exp (JVM
    handle — bit-identical by construction), space-only trims, string
    predicates, concat_ws — all repr-exact vs the Catalyst fold."""
    rows = [(1, 2, 0.5, " \tpad me ", True, 1, 0),
            (2, -3, 4.0, "", False, 1, 0),
            (None, None, None, None, None, 1, 1),
            (3, 5, -1.5, "abc def", True, -1, 1),
            (4, 7, NAN, "xyz", False, 1, 2),
            (5, 9, INF, " s", None, 1, 2)]
    _dual(spark, lambda df: df.select(
        (F.col("d") / 2.0).alias("dv"),
        (F.col("d") / F.col("d")).alias("dd"),
        F.abs(F.col("d")).alias("ad"),
        F.abs(F.col("j")).alias("aj"),
        F.sqrt(F.col("d")).alias("sq"),
        F.log(F.col("d") + 1.0).alias("lg"),
        F.exp(F.col("d")).alias("ex"),
        F.trim("s").alias("tr"),
        F.ltrim("s").alias("lt"),
        F.rtrim("s").alias("rt"),
        F.col("s").contains("a").alias("ct"),
        F.col("s").startswith(" ").alias("sw"),
        F.col("s").endswith("e ").alias("ew"),
        F.concat_ws("-", F.col("s"), F.lit("k")).alias("cw"),
        "_pw_diff", "_pw_time"), rows=rows)


def test_divide_by_zero_ansi_escape(spark):
    cc = compile_fn(spark, lambda df: df.select(
        (F.col("d") / F.col("d")).alias("x"), "_pw_diff", "_pw_time"), SCH)
    assert cc is not None
    bad = [(1, 1, 0.0, "x", True, 1, 0)]
    with pytest.raises(PyEvalEscape):
        cc.run(bad, COLS)


def test_double_mod_zero_matches_spark(spark):
    """5.0D % 0.0D: Spark yields NULL (non-ANSI) or throws (ANSI);
    math.fmod raises ValueError, which before r11 pinned the node off
    through the generic handler instead of returning NULL/escaping."""
    cc = compile_fn(spark, lambda df: df.select(
        (F.col("d") % F.lit(0.0)).alias("x"), "_pw_diff", "_pw_time"), SCH)
    assert cc is not None
    bad = [(1, 1, 5.0, "x", True, 1, 0)]
    ansi = str(spark.conf.get("spark.sql.ansi.enabled")).lower() == "true"
    if ansi:
        with pytest.raises(PyEvalEscape):
            cc.run(bad, COLS)
    else:
        assert cc.run(bad, COLS) == [(None, 1, 0)]
    # non-zero divisor still evaluates (Java sign = dividend's)
    ok = [(1, 1, 5.5, "x", True, 1, 0)]
    cc2 = compile_fn(spark, lambda df: df.select(
        (F.col("d") % F.lit(2.0)).alias("x"), "_pw_diff", "_pw_time"), SCH)
    assert cc2.run(ok, COLS) == [(1.5, 1, 0)]


def test_bm25_score_shape_compiles_exactly(spark):
    """The exact expression shape incremental_bm25's fan-out select
    uses — log/divide/casts over long columns — must compile and match
    Catalyst byte-for-byte, so serving ticks stay JVM-free."""
    sch = T.StructType([
        T.StructField("tf", T.LongType()),
        T.StructField("dl", T.LongType()),
        T.StructField("df", T.LongType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("__dlsum", T.LongType()),
        T.StructField("__dln", T.LongType()),
        T.StructField("_pw_diff", T.LongType()),
        T.StructField("_pw_time", T.LongType()),
    ])
    k1, b = 1.2, 0.75
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    avgdl = F.col("__dlsum") / F.col("__dln")
    s = (idf * (F.col("tf") * (k1 + 1))
         / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)))
    fn = lambda df: df.select(s.alias("__s"), "_pw_diff", "_pw_time")
    cc = compile_fn(spark, fn, sch)
    assert cc is not None, "BM25 score shape must compile"
    import random as _rnd
    rng = _rnd.Random(4242)
    rows = [(rng.randint(1, 40), rng.randint(5, 400), rng.randint(1, 90),
             100, 20000, 100, 1, 0) for _ in range(120)]
    cols = [f.name for f in sch.fields]
    from pathway_spark.streaming.resident import collect_rows
    prows = cc.run(rows, cols)
    srows = collect_rows(fn(spark.createDataFrame(rows, sch)))
    assert [tuple(map(repr, r)) for r in prows] \
        == [tuple(map(repr, r)) for r in srows]


def test_isin_three_valued(spark):
    """col.isin(...) under SQL IN semantics: NULL value -> NULL; a
    NULL in the literal list turns a miss into NULL; double membership
    uses Spark's NaN-equals-NaN comparison."""
    rows = [(1, 1, 1.0, "a", True, 1, 0),
            (2, 2, NAN, "b", False, 1, 0),
            (None, None, None, None, None, 1, 1),
            (7, 7, 2.5, "zz", True, -1, 1)]
    _dual(spark, lambda df: df.select(
        F.col("i").isin(1, 7).alias("a"),
        F.col("s").isin("a", "zz").alias("b"),
        F.col("i").isin(F.lit(2), F.lit(None).cast("long")).alias("c"),
        F.col("d").isin(float("nan"), 9.9).alias("dn"),
        "_pw_diff", "_pw_time"), rows=rows)
