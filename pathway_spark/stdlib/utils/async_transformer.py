"""AsyncTransformer — reference `stdlib/utils/async_transformer.py:387`."""
from __future__ import annotations

import asyncio
from typing import Iterator

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ...schema import Schema
from ...table import ID, Table


class AsyncTransformer:
    """Table→table async row transformer (reference
    `async_transformer.py:387`): subclass with an async ``invoke(**row)
    -> dict`` and a class-level ``output_schema``.

    Spark mapping (SURVEY §2.9): mapInPandas over Arrow batches; each
    batch drives one asyncio event loop and gathers all row coroutines —
    concurrency without per-row GIL crossings. Failed rows go to
    ``.failed`` (id only); ``.successful``/``.result`` carry outputs.
    No ``Future`` cells: results resolve within the batch.
    """

    output_schema: type[Schema] | None = None

    def __init__(self, input_table: Table):
        if self.output_schema is None:
            raise TypeError("AsyncTransformer subclass must set output_schema")
        self._input = input_table
        self._materialized: Table | None = None

    async def invoke(self, **kwargs) -> dict:
        raise NotImplementedError

    def __getstate__(self):
        # the bound invoke ships to executors; drop driver-only refs
        d = dict(self.__dict__)
        d.pop("_input", None)
        d.pop("_materialized", None)
        return d

    def _run(self) -> Table:
        if self._materialized is not None:
            return self._materialized
        in_df = self._input._df
        in_cols = [c for c in in_df.columns if c != ID]
        out_struct = self.output_schema.to_struct_type()
        schema = T.StructType(
            [T.StructField(ID, T.LongType()), T.StructField("__pw_ok", T.BooleanType())]
            + list(out_struct.fields)
        )
        invoke = self.invoke
        out_names = [f.name for f in out_struct.fields]

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            async def one(row: dict):
                try:
                    res = await invoke(**row)
                    return True, res
                except Exception:
                    return False, {}

            for pdf in batches:
                rows = pdf.to_dict("records")
                ids = [r.pop(ID) for r in rows]

                async def drive():
                    return await asyncio.gather(*(one(r) for r in rows))

                results = asyncio.run(drive())
                out = {
                    ID: ids,
                    "__pw_ok": [ok for ok, _ in results],
                }
                for n in out_names:
                    out[n] = [res.get(n) for _, res in results]
                yield pd.DataFrame(out)

        mapped = in_df.select(ID, *in_cols).mapInPandas(run, schema)
        self._materialized = Table(mapped)
        return self._materialized

    @property
    def successful(self) -> Table:
        t = self._run()
        return Table(t._df.filter(F.col("__pw_ok")).drop("__pw_ok"))

    @property
    def failed(self) -> Table:
        t = self._run()
        return Table(t._df.filter(~F.col("__pw_ok")).select(ID))

    @property
    def result(self) -> Table:
        return self.successful

    def with_options(self, **kwargs) -> "AsyncTransformer":
        return self


