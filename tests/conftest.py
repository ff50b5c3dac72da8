import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# `pytest -m quick` — the fast correctness core (oracle gates, physical-
# plan gates, operator goldens, TPC-H results): the set a time-budgeted
# verifier should run first.  Kept under ~10 minutes; the full suite is
# unchanged (plain `pytest tests/` runs everything).
_QUICK_MODULES = {"test_oracle", "test_plans", "test_operators", "test_tpch"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item, "module", None)
        if mod is not None and mod.__name__.rsplit(".", 1)[-1] in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pathway_spark.session import get_spark

    s = get_spark("pathway-spark-tests", cpus=os.environ["SPARK_GRAFT_CPUS"])
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def _reset_steady_confs(request):
    """DifferentialGraph.step tunes session confs for steady micro-
    batches (AQE off, tiny shuffle partitions) and leaves them applied
    for the caller's action — reset after each test so unrelated tests
    see the session defaults."""
    yield
    if "spark" in request.fixturenames:
        s = request.getfixturevalue("spark")
        s.conf.set("spark.sql.adaptive.enabled", "true")
        s.conf.set("spark.sql.shuffle.partitions",
                   os.environ.get("SPARK_GRAFT_CPUS", "8"))
        s.conf.unset("spark.sql.codegen.wholeStage")
        # drop any saved pre-tuning snapshot so the next graph
        # re-snapshots the (now restored) session defaults
        from pathway_spark.streaming.differential import DifferentialGraph
        setattr(s, DifferentialGraph._SAVED_CONF_ATTR, None)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
