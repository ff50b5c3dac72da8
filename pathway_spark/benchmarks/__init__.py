"""Benchmark query suites expressed in the pathway_spark API."""

from . import tpch  # noqa: F401
