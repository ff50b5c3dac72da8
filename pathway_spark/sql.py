"""SQL frontend — `pw.sql(query, **tables)`.

Reference (`python/pathway/internals/sql/__init__.py:7-86`) parses with
sqlglot and emits Table API calls, rejecting ORDER BY / LIMIT / LIKE /
EXISTS / CAST / COALESCE. Spark's `spark.sql` is a strict superset
(SURVEY §2.13): we register temp views and delegate — keeping the
reference's `id`-excluded-from-`*` convention by dropping `_pw_id`
from the registered views.
"""

from __future__ import annotations

import itertools

from .table import ID, Table

_n = itertools.count()


def sql(query: str, **tables: Table) -> Table:
    spark = None
    suffix = f"_pwsql{next(_n)}"
    q = query
    for name, t in tables.items():
        spark = t._df.sparkSession
        view = f"{name}{suffix}"
        t.to_df().createOrReplaceTempView(view)
        # replace whole-word occurrences of the table name
        import re
        q = re.sub(rf"\b{re.escape(name)}\b", view, q)
    if spark is None:
        from .session import get_spark
        spark = get_spark()
    return Table(spark.sql(q))
