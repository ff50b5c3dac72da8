"""Monitoring HTTP surface — reference `src/engine/http_server.rs`
(engine /status endpoint) + `python/pathway/internals/monitoring.py`
(operator latency/rows dashboard).

The reference serves a JSON snapshot of the running dataflow (per-
operator input rows, latency to now, memory). Spark already tracks the
equivalents per query/job/stage; this module re-exposes them on a
lightweight JSON endpoint so reference users keep their scrape targets
when the Spark UI isn't reachable (headless clusters, containers).

Endpoints (all GET):
- ``/status``  — app info + active jobs/stages + per-streaming-query
  progress (input rate, processed rate, batch duration, state rows).
- ``/metrics`` — flat scrape-friendly ``{name: number}`` map (JSON).
- ``/`` and ``/dashboard`` — a zero-dependency HTML dashboard polling
  ``/status`` (the reference ships a browser dashboard,
  `python/pathway/web_dashboard/dashboard.py`; this is its
  Spark-engine counterpart: app card, job/stage gauges, one row per
  streaming query with rate sparklines — plain inline JS, no external
  assets, usable from headless clusters over a port-forward).
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
        self.webserver.register_handler("/", self._dashboard, ("GET",))
        self.webserver.register_handler("/dashboard", self._dashboard,
                                        ("GET",))

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
            # differential-engine graph topology + per-node tick
            # timings split by execution path (resident vs
            # distributed) — the reference dashboard's operator-graph
            # view (python/pathway/web_dashboard/)
            "differential": self._differential(),
        }

    @staticmethod
    def _differential() -> list[dict]:
        from .streaming.differential import live_graphs
        out = []
        for i, g in enumerate(live_graphs()):
            try:
                topo = g.topology()
            except Exception:           # a graph mid-teardown
                continue
            topo["graph"] = i
            out.append(topo)
        return out

    def _status(self, _method: str, _payload: dict):
        return 200, self.snapshot()

    def _dashboard(self, _method: str, _payload: dict):
        from .io.http_server import RawResponse
        return 200, RawResponse(_DASHBOARD_HTML)

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
        # differential-engine execution-path counters (process-wide):
        # how many steady ticks ran on the resident fast path vs fell
        # back to the distributed rules — the first thing to check when
        # live latency regresses (a fallback storm means caps or an
        # ineligible operator)
        from .streaming.resident import STATS as _res_stats
        out["pathway_spark_resident_ticks"] = _res_stats["resident_ticks"]
        out["pathway_spark_resident_fallbacks"] = \
            _res_stats["fallback_ticks"]
        # resident driver-heap pressure per live graph: watch
        # est_bytes approach the per-store cap before a detach storm
        for gr in snap.get("differential", []):
            mem = gr.get("resident_memory")
            if not mem:
                continue
            gi = gr.get("graph", 0)
            out[f"pathway_spark_resident_state_bytes{{graph{gi}}}"] = \
                mem["est_bytes_total"]
            out[f"pathway_spark_resident_mirror_admissions{{graph{gi}}}"] \
                = mem["events"]["mirror_admissions"]
            out[f"pathway_spark_resident_cap_detaches{{graph{gi}}}"] = \
                mem["events"]["cap_detaches"]
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


# Zero-dependency dashboard page: polls /status once a second, keeps a
# rolling window of per-query rates driver-side IN THE BROWSER, and
# draws sparklines on small canvases.  No external assets (headless
# clusters often have no internet egress).
_DASHBOARD_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>pathway-spark dashboard</title>
<style>
 body{font-family:system-ui,sans-serif;margin:1.2rem;background:#101418;
      color:#e6e9ec}
 h1{font-size:1.1rem;margin:0 0 .8rem}
 .cards{display:flex;gap:.8rem;flex-wrap:wrap;margin-bottom:1rem}
 .card{background:#1a2026;border:1px solid #2a323a;border-radius:8px;
       padding:.6rem .9rem;min-width:8rem}
 .card .v{font-size:1.4rem;font-weight:600}
 .card .k{font-size:.72rem;color:#93a1ad;text-transform:uppercase}
 table{border-collapse:collapse;width:100%}
 th,td{padding:.35rem .6rem;border-bottom:1px solid #2a323a;
       font-size:.85rem;text-align:right}
 th:first-child,td:first-child{text-align:left}
 th{color:#93a1ad;font-weight:500}
 canvas{vertical-align:middle}
 .err{color:#ff7a7a}
</style></head><body>
<h1>pathway-spark <span id="app" style="color:#93a1ad"></span></h1>
<div class="cards" id="cards"></div>
<table><thead><tr>
 <th>streaming query</th><th>batch</th><th>rows/s in</th>
 <th>rows/s done</th><th>batch ms</th><th>state rows</th><th>trend</th>
</tr></thead><tbody id="qs"></tbody></table>
<div id="diff"></div>
<div id="err" class="err"></div>
<script>
const hist = {};              // query id -> rolling processed-rate window
function card(k, v) {
  return `<div class="card"><div class="v">${v}</div>` +
         `<div class="k">${k}</div></div>`;
}
function spark(cv, xs) {
  const c = cv.getContext("2d"), w = cv.width, h = cv.height;
  c.clearRect(0, 0, w, h);
  if (!xs.length) return;
  const mx = Math.max(...xs, 1e-9);
  c.beginPath(); c.strokeStyle = "#5ec2ff"; c.lineWidth = 1.5;
  xs.forEach((v, i) => {
    const x = i / Math.max(xs.length - 1, 1) * (w - 2) + 1;
    const y = h - 2 - (v / mx) * (h - 4);
    i ? c.lineTo(x, y) : c.moveTo(x, y);
  });
  c.stroke();
}
async function tick() {
  try {
    const s = await (await fetch("status")).json();
    document.getElementById("err").textContent = "";
    document.getElementById("app").textContent =
      `${s.app.name} @ ${s.app.master}`;
    document.getElementById("cards").innerHTML =
      card("uptime s", s.app.uptimeSec) +
      card("parallelism", s.app.defaultParallelism) +
      card("active jobs", s.jobs.active) +
      card("active stages", s.stages.active) +
      card("queries", s.streamingQueries.length);
    const tb = document.getElementById("qs");
    tb.innerHTML = "";
    for (const q of s.streamingQueries) {
      (hist[q.id] = hist[q.id] || []).push(q.processedRowsPerSecond || 0);
      if (hist[q.id].length > 60) hist[q.id].shift();
      const tr = document.createElement("tr");
      tr.innerHTML =
        `<td>${q.name || q.id}${q.isActive ? "" : " (stopped)"}</td>` +
        `<td>${q.batchId ?? ""}</td>` +
        `<td>${(q.inputRowsPerSecond ?? 0).toFixed(1)}</td>` +
        `<td>${(q.processedRowsPerSecond ?? 0).toFixed(1)}</td>` +
        `<td>${q.batchDurationMs ?? ""}</td>` +
        `<td>${q.stateRows ?? 0}</td>` +
        `<td><canvas width="120" height="24"></canvas></td>`;
      tb.appendChild(tr);
      spark(tr.querySelector("canvas"), hist[q.id]);
    }
    // differential-engine graphs: one node table per live graph, the
    // per-node tick split showing which operators ride the resident
    // fast path and which still pay distributed ticks
    const dv = document.getElementById("diff");
    dv.innerHTML = "";
    for (const gr of (s.differential || [])) {
      const head = document.createElement("h1");
      head.textContent = `differential graph #${gr.graph} — t=${gr.t}, ` +
        `${gr.n_nodes} nodes` + (gr.resident_active ? " (resident)" : "");
      dv.appendChild(head);
      const mem = gr.resident_memory;
      if (mem && mem.stores.length) {
        const ml = document.createElement("div");
        ml.className = "mem";
        const mb = (b) => (b / 1048576).toFixed(2) + " MiB";
        ml.textContent =
          `resident state ${mb(mem.est_bytes_total)} across ` +
          `${mem.stores.length} mirrors (cap ` +
          `${mb(mem.max_state_bytes_per_store)}/store) — ` +
          `admissions ${mem.events.mirror_admissions}, ` +
          `cap detaches ${mem.events.cap_detaches}; pyexpr ` +
          `on/verify/off ${mem.pyexpr.on}/${mem.pyexpr.verify}/` +
          `${mem.pyexpr.off}`;
        dv.appendChild(ml);
      }
      const tbl = document.createElement("table");
      tbl.innerHTML = "<thead><tr><th>#</th><th>operator</th>" +
        "<th>inputs</th><th>res ticks</th><th>res ms</th>" +
        "<th>dist ticks</th><th>dist ms</th></tr></thead>";
      const body = document.createElement("tbody");
      for (const n of gr.nodes) {
        const tr2 = document.createElement("tr");
        tr2.innerHTML =
          `<td>${n.i}</td>` +
          `<td>${n.op}${n.name ? " (" + n.name + ")" : ""}</td>` +
          `<td>${n.inputs.join(",")}</td>` +
          `<td>${n.res_ticks}</td><td>${n.res_ms}</td>` +
          `<td>${n.dist_ticks}</td><td>${n.dist_ms}</td>`;
        body.appendChild(tr2);
      }
      tbl.appendChild(body);
      dv.appendChild(tbl);
    }
  } catch (e) {
    document.getElementById("err").textContent = "poll failed: " + e;
  }
}
tick(); setInterval(tick, 1000);
</script></body></html>
"""
