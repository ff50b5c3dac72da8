import pytest
from pyspark.sql import functions as F
from pathway_spark.streaming.differential import DIFF, DifferentialGraph
from pathway_spark.streaming.incremental_graph import incremental_louvain
from pathway_spark.operators.iterate import louvain_communities
from pathway_spark.table import ID, Table

def _edges(spark, rows, diff=1):
    df = spark.createDataFrame(rows, "u long, v long, weight long")
    return df.withColumn(DIFF, F.lit(diff)) if diff != 1 else df

def test_incremental_louvain_prefix_equals_batch(spark):
    g = DifferentialGraph(spark)
    src = g.source("e", spark.createDataFrame([], "u long, v long, weight long"))
    out = incremental_louvain(src, max_iterations=6)
    batches = [
        ([(1,2,5),(2,3,5),(3,1,5),(10,11,4),(11,12,4)], []),
        ([(3,10,1)], []),                    # weak inter-community link
        ([], [(3,10,1)]),                    # retract it
        ([(12,10,4),(1,4,5)], [(2,3,5)]),
    ]
    live, log = [], None
    for ins, dels in batches:
        parts = []
        if ins: parts.append(_edges(spark, ins))
        if dels: parts.append(_edges(spark, dels, diff=-1))
        delta = parts[0]
        if len(parts) == 2:
            delta = parts[0].withColumn(DIFF, F.lit(1)).unionByName(parts[1])
        for e in dels: live.remove(e)
        live += ins
        (d,) = g.step(out, e=delta)
        d = d.localCheckpoint(eager=True)
        log = d if log is None else log.unionByName(d)
        got = sorted((r["n"], r["label"]) for r in DifferentialGraph.integrate(log).collect())
        want = sorted(tuple(r) for r in louvain_communities(
            Table(spark.createDataFrame(live, "u long, v long, weight long")),
            max_iterations=6)._df.drop(ID).collect())
        assert got == want, f"after ins={ins} dels={dels}:\n{got}\n{want}"
