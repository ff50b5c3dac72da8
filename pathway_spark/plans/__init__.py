"""Plan inspection utilities — the feedback loop for scale tuning.

`check_plan` asserts the physical properties the 100 TB design relies on:
filters/projections pushed into the parquet scan, broadcast joins where
expected, whole-stage codegen coverage.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

from ..table import Table


def plan_text(obj, mode: str = "formatted") -> str:
    df = obj._df if isinstance(obj, Table) else obj
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_report(obj) -> dict:
    import re

    txt = plan_text(obj)

    def n(op: str) -> int:
        # formatted explain prints each node once in the tree and once in
        # the numbered detail section — count the "(k) Op" detail lines
        return len(re.findall(rf"^\(\d+\) {op}\b", txt, flags=re.M))

    return {
        "pushed_filters": "PushedFilters: [" in txt and "PushedFilters: []" not in txt,
        "broadcast_joins": n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin"),
        "sortmerge_joins": n("SortMergeJoin"),
        "shuffles": n("Exchange"),
        "codegen_stages": len(re.findall(r"WholeStageCodegen", txt)),
        "python_evals": n("BatchEvalPython") + n("ArrowEvalPython"),
    }


def assert_no_python_in_plan(obj) -> None:
    rep = plan_report(obj)
    assert rep["python_evals"] == 0, f"python UDF found in hot path:\n{plan_text(obj)}"
