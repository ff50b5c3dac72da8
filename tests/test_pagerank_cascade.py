"""Level-cascade pagerank: giant-component-safe, prefix-equal to the
batch fixed-point-integer operator under inserts and retracts."""

from pyspark.sql import functions as F

from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.incremental_graph import (
    incremental_pagerank_cascade)
from pathway_spark.operators.iterate import pagerank_exact
from pathway_spark.table import ID, Table


def _edges(spark, rows, diff=1):
    df = spark.createDataFrame(rows, "u long, v long")
    return df.withColumn(DIFF, F.lit(diff)) if diff != 1 else df


def test_cascade_pagerank_prefix_equals_batch(spark):
    g = DifferentialGraph(spark)
    src = g.source("e", spark.createDataFrame([], "u long, v long"))
    out = incremental_pagerank_cascade(src, steps=4)

    batches = [
        ([(1, 2), (2, 3), (3, 1), (3, 4)], []),
        ([(4, 1), (5, 1)], []),
        ([], [(3, 4)]),               # retract: node 4 leaves entirely? no, 4->1 stays
        ([(2, 4)], [(5, 1)]),         # node 5 disappears
    ]
    live, log = [], None
    for ins, dels in batches:
        delta = _edges(spark, ins)
        if dels:
            delta = (delta.withColumn(DIFF, F.lit(1))
                     .unionByName(_edges(spark, dels, diff=-1)))
        for e in dels:
            live.remove(e)
        live += ins
        (d,) = g.step(out, e=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        got = sorted((r["w"], r["rank"]) for r in
                     DifferentialGraph.integrate(log).collect())
        want = sorted(tuple(r) for r in pagerank_exact(
            Table(spark.createDataFrame(live, "u long, v long")),
            steps=4)._df.drop(ID).collect())
        assert got == want, f"after ins={ins} dels={dels}:\n{got}\n{want}"


def test_cascade_bellman_ford_prefix_equals_batch(spark):
    from pathway_spark.streaming.incremental_graph import (
        incremental_bellman_ford_cascade)
    from pathway_spark.operators.iterate import bellman_ford

    g = DifferentialGraph(spark)
    src = g.source("e", spark.createDataFrame(
        [], "u long, v long, dist double"))
    out = incremental_bellman_ford_cascade(src, start_vertex=1)

    batches = [
        ([(1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0)], []),
        ([(3, 4, 1.5), (9, 10, 1.0)], []),     # unreachable island
        ([], [(2, 3, 2.0)]),                   # distances GROW (hard case)
        ([(1, 4, 0.5)], []),                   # shortcut shrinks d(4)
    ]
    live, log = [], None
    for ins, dels in batches:
        delta = spark.createDataFrame(ins, "u long, v long, dist double")
        if dels:
            delta = (delta.withColumn(DIFF, F.lit(1)).unionByName(
                spark.createDataFrame(dels, "u long, v long, dist double")
                .withColumn(DIFF, F.lit(-1))))
        for x in dels:
            live.remove(x)
        live += ins
        (d,) = g.step(out, e=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        got = sorted(
            (r["w"], r["d"]) for r in
            DifferentialGraph.integrate(log).collect())
        edf = spark.createDataFrame(live, "u long, v long, dist double")
        vdf = (edf.select(F.col("u").alias("w"))
               .union(edf.select("v")).distinct())
        want = sorted(tuple(r) for r in bellman_ford(
            Table(vdf), Table(edf), 1)._df.drop(ID).collect())
        assert got == want, f"after ins={ins} dels={dels}:\n{got}\n{want}"
