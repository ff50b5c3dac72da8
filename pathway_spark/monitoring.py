"""Monitoring HTTP surface — reference `src/engine/http_server.rs`
(engine /status endpoint) + `python/pathway/internals/monitoring.py`
(operator latency/rows dashboard).

The reference serves a JSON snapshot of the running dataflow (per-
operator input rows, latency to now, memory). Spark already tracks the
equivalents per query/job/stage; this module re-exposes them on a
lightweight JSON endpoint so reference users keep their scrape targets
when the Spark UI isn't reachable (headless clusters, containers).

Endpoints (all GET, JSON):
- ``/status``  — app info + active jobs/stages + per-streaming-query
  progress (input rate, processed rate, batch duration, state rows).
- ``/metrics`` — flat scrape-friendly ``{name: number}`` map.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import SparkSession

from .io.http_server import PathwayWebserver


def _query_progress(q) -> dict[str, Any]:
    lp = q.lastProgress or {}
    state = lp.get("stateOperators") or []
    return {
        "id": str(q.id),
        "name": q.name,
        "isActive": q.isActive,
        "batchId": lp.get("batchId"),
        "inputRowsPerSecond": lp.get("inputRowsPerSecond"),
        "processedRowsPerSecond": lp.get("processedRowsPerSecond"),
        "numInputRows": lp.get("numInputRows"),
        "batchDurationMs": (lp.get("durationMs") or {}).get("triggerExecution"),
        "stateRows": sum(s.get("numRowsTotal", 0) for s in state),
        "watermark": (lp.get("eventTime") or {}).get("watermark"),
    }


class MonitoringServer:
    """Serve engine status over HTTP; ``start()`` returns the bound port."""

    def __init__(self, spark: SparkSession | None = None, *,
                 host: str = "127.0.0.1", port: int = 0,
                 webserver: PathwayWebserver | None = None):
        if spark is None:
            from .session import get_spark
            spark = get_spark()
        self.spark = spark
        self._t0 = time.time()
        self.webserver = webserver or PathwayWebserver(
            host, port, with_schema_endpoint=False)
        self.webserver.register_handler("/status", self._status, ("GET",))
        self.webserver.register_handler("/metrics", self._metrics, ("GET",))

    # ------------------------------------------------------------- snapshot
    def snapshot(self) -> dict[str, Any]:
        sc = self.spark.sparkContext
        tracker = sc.statusTracker()
        active_jobs = tracker.getActiveJobsIds()
        active_stages = tracker.getActiveStageIds()
        return {
            "app": {
                "id": sc.applicationId,
                "name": sc.appName,
                "master": sc.master,
                "defaultParallelism": sc.defaultParallelism,
                "uptimeSec": round(time.time() - self._t0, 1),
            },
            "jobs": {"active": len(active_jobs), "ids": list(active_jobs)},
            "stages": {"active": len(active_stages)},
            "streamingQueries": [
                _query_progress(q) for q in self.spark.streams.active
            ],
        }

    def _status(self, _method: str, _payload: dict):
        return 200, self.snapshot()

    def _metrics(self, _method: str, _payload: dict):
        snap = self.snapshot()
        out: dict[str, float] = {
            "pathway_spark_uptime_seconds": snap["app"]["uptimeSec"],
            "pathway_spark_active_jobs": snap["jobs"]["active"],
            "pathway_spark_active_stages": snap["stages"]["active"],
            "pathway_spark_active_queries": len(snap["streamingQueries"]),
        }
        for q in snap["streamingQueries"]:
            key = (q["name"] or q["id"]).replace("-", "_")
            for metric in ("inputRowsPerSecond", "processedRowsPerSecond",
                           "numInputRows", "batchDurationMs", "stateRows"):
                v = q.get(metric)
                if v is not None:
                    out[f"pathway_spark_query_{metric}{{{key}}}"] = v
        return 200, out

    # ------------------------------------------------------------ lifecycle
    def start(self) -> int:
        self.webserver.start()
        return self.webserver.port

    def stop(self) -> None:
        self.webserver.stop()


def run_monitoring_server(spark: SparkSession | None = None, *,
                          host: str = "127.0.0.1",
                          port: int = 0) -> MonitoringServer:
    """One-call variant mirroring the reference's `with_monitoring`
    convenience: construct + start."""
    m = MonitoringServer(spark, host=host, port=port)
    m.start()
    return m
