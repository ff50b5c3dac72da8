"""`pw.viz` — reference `python/pathway/stdlib/viz/__init__.py` (plot/show).

The reference renders live Bokeh/Panel dashboards in notebooks. Plot libs
aren't baked into this container, so the real code path is gated on their
presence; without them these raise a clear ImportError (SURVEY §4 —
visualization is notebook sugar, not part of the query engine)."""

from __future__ import annotations

from ..table import Table


def _pandas_preview(table: Table, n: int = 1000):
    return table.to_df().limit(n).toPandas()


def plot(table: Table, plotting_function, *, sorting_col=None):
    try:
        import bokeh.plotting  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "pw.viz.plot requires bokeh (not available in this container)"
        ) from exc
    pdf = _pandas_preview(table)
    if sorting_col:
        pdf = pdf.sort_values(sorting_col)
    from bokeh.models import ColumnDataSource

    return plotting_function(ColumnDataSource(pdf))


def show(table: Table, *, include_id: bool = True, short_pointers: bool = True,
         snapshot: bool = True):
    """Notebook display; falls back to a driver-side pandas preview print
    when panel/bokeh are absent."""
    try:
        import panel  # noqa: F401

        return panel.widgets.Tabulator(_pandas_preview(table))
    except ImportError:
        from .. import debug

        debug.compute_and_print(table)
        return None


__all__ = ["plot", "show"]
