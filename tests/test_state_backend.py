"""Object-store-capable durable state (round 8).

`state_dir` may now be any Hadoop-resolvable URI; these tests drive the
RENAME-FREE protocol (uuid-suffixed version dirs + an append-only
`_meta/` commit log — see `pathway_spark/streaming/state_backend.py`)
through `file://` URIs, which exercise exactly the same code path a
real `s3a://` deployment uses (only the FileSystem implementation
differs).  Reference parity: the engine persists to file or S3 backends
(`src/persistence/backends/file.rs`, `backends/s3.rs`).
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from pathway_spark.streaming.differential import (
    DIFF, DifferentialGraph, _StateStore,
)
from pathway_spark.streaming.state_backend import (
    HadoopMetaBackend, HadoopStoreBackend,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _build(g, tpl):
    return g.source("t", tpl).reduce(["k"], mx=("max", "v"), n=("count",))


def test_uri_state_dir_commit_restore_roundtrip(spark, tmp_path):
    """commit -> new process restores the committed snapshot and the
    continued stream matches an uninterrupted run — with state living
    behind a file:// URI (Hadoop FS, no POSIX rename anywhere)."""
    sd = f"file://{tmp_path}/state"
    tpl = spark.createDataFrame([], "k long, v long")

    batches = [[(1, 10), (2, 20)], [(1, 30)], [(2, 5), (3, 7)]]

    g0 = DifferentialGraph(spark)
    q0 = _build(g0, tpl)
    full = [g0.step(q0, t=spark.createDataFrame(b, tpl.schema))[0]
            .collect() for b in batches]

    g1 = DifferentialGraph(spark, state_dir=sd)
    q1 = _build(g1, tpl)
    for b in batches[:2]:
        g1.step(q1, t=spark.createDataFrame(b, tpl.schema))
    g1.commit()

    # protocol shape on disk: uuid-suffixed version dirs with _SUCCESS,
    # and an append-only _meta log — no _meta.json, no bare v-dirs
    root = str(tmp_path / "state")
    assert os.path.isdir(f"{root}/_meta")
    assert not os.path.exists(f"{root}/_meta.json")
    stores = [d for d in os.listdir(root) if d.startswith("store_")]
    assert stores
    for s in stores:
        vers = [d for d in os.listdir(f"{root}/{s}")
                if d.startswith("v")]
        assert vers and all("-" in v for v in vers), vers
        assert all(os.path.isfile(f"{root}/{s}/{v}/_SUCCESS")
                   for v in vers)

    g2 = DifferentialGraph(spark, state_dir=sd)
    q2 = _build(g2, tpl)
    (d3,) = g2.step(q2, t=spark.createDataFrame(batches[2], tpl.schema))

    def norm(rows):
        return sorted((r["k"], r["mx"], r["n"], r[DIFF]) for r in rows)
    assert norm(d3.collect()) == norm(full[2])
    g2.restore_session_confs()


def test_uri_meta_log_is_append_only_and_latest_wins(spark, tmp_path):
    """Each commit appends one _meta entry; load() resolves the
    greatest (seq, name), so a torn/racing writer can never roll the
    committed clock backwards."""
    sd = f"file://{tmp_path}/state"
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=sd)
    q = _build(g, tpl)
    for i in range(3):
        g.step(q, t=spark.createDataFrame([(1, i)], tpl.schema))
        g.commit()
    entries = sorted(e for e in os.listdir(f"{tmp_path}/state/_meta")
                     if e.endswith(".json"))   # RawLocalFS adds .crc
    assert len(entries) == 3
    assert [e.split("-")[0] for e in entries] == [
        "000000000001", "000000000002", "000000000003"]
    meta = HadoopMetaBackend(spark, sd).load()
    assert meta["t"] == g._t
    g.restore_session_confs()


def test_uri_vacuum_retains_previous_committed_version(spark, tmp_path):
    """Same two-version retention as the POSIX backend: after commit N
    the version of commit N-1 survives; N-2's is reclaimed."""
    sd = f"file://{tmp_path}/state"
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=sd)
    q = _build(g, tpl)

    def versions():
        out = {}
        root = str(tmp_path / "state")
        for d in sorted(os.listdir(root)):
            if d.startswith("store_"):
                out[d] = sorted(v for v in os.listdir(f"{root}/{d}")
                                if v.startswith("v"))
        return out

    snaps = []
    for i in range(3):
        g.step(q, t=spark.createDataFrame([(1, 10 + i)], tpl.schema))
        g.commit()
        snaps.append(versions())
    for store in snaps[1]:
        assert set(snaps[0][store]) <= set(snaps[1][store])
    for store in snaps[2]:
        assert set(snaps[0][store]) & set(snaps[2][store]) == set()
        assert set(snaps[1][store]) - set(snaps[0][store]) \
            <= set(snaps[2][store])
    g.restore_session_confs()


def test_uri_commit_racing_concurrent_compaction(spark, tmp_path):
    """The compactor-race guarantee holds WITHOUT atomic rename:
    uuid-unique version names make concurrent publication collision-
    free, and the committed meta keeps pointing at its own token."""
    sd = f"file://{tmp_path}/state"
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=sd)
    out = _build(g, tpl)
    (d0,) = g.step(out, t=spark.createDataFrame(
        [(i % 10, i) for i in range(200)], tpl.schema))
    d0.localCheckpoint(eager=True).count()
    g.commit()

    stop = threading.Event()
    errs: list = []

    def compactor():
        while not stop.is_set():
            try:
                for st in list(g._stores):
                    st.compact_versions()
            except Exception as e:      # pragma: no cover
                errs.append(e)
                return

    th = threading.Thread(target=compactor, daemon=True)
    th.start()
    try:
        for i in range(3):
            (d,) = g.step(out, t=spark.createDataFrame(
                [(i % 10, 1000 + i)], tpl.schema))
            d.localCheckpoint(eager=True).count()
            g.commit()
    finally:
        stop.set()
        th.join(timeout=60)
    assert not errs, errs
    g.restore_session_confs()

    g2 = DifferentialGraph(spark, state_dir=sd)
    out2 = _build(g2, tpl)
    (d2,) = g2.step(out2, t=spark.createDataFrame([(3, 10**9)], tpl.schema))
    rows = {(r["k"], r["mx"], r["n"], r[DIFF]) for r in d2.collect()}
    assert (3, 10**9, 21, 1) in rows, rows
    g2.restore_session_confs()


def test_uri_bucketed_restore_probe_prunes(spark, tmp_path, monkeypatch):
    """A large keyed state flushed through the URI backend keeps the
    hash-bucketed layout, and a restored probe prunes the scan to the
    touched buckets (partition filter on __pw_bucket)."""
    monkeypatch.setattr(_StateStore, "SMALL_STATE_ROWS", 100)
    sd = f"file://{tmp_path}/state"
    tpl = spark.createDataFrame([], "k long, v long")
    g = DifferentialGraph(spark, state_dir=sd)
    q = _build(g, tpl)
    rows = [(i % 200, i) for i in range(2000)]
    g.step(q, t=spark.createDataFrame(rows, tpl.schema))
    g.commit()
    g.restore_session_confs()

    g2 = DifferentialGraph(spark, state_dir=sd)
    q2 = _build(g2, tpl)
    # bucket-partitioned dirs present under the committed version
    root = str(tmp_path / "state")
    store_dirs = [d for d in os.listdir(root) if d.startswith("store_")]
    bucketed = False
    for s in store_dirs:
        for v in os.listdir(f"{root}/{s}"):
            if v.startswith("v") and any(
                    b.startswith("__pw_bucket=") for b in
                    os.listdir(f"{root}/{s}/{v}")):
                bucketed = True
    assert bucketed, "keyed 2000-row state should flush bucketed"
    (d,) = g2.step(q2, t=spark.createDataFrame([(7, 10**6)], tpl.schema))
    got = {(r["k"], r["mx"], r["n"], r[DIFF]) for r in d.collect()}
    assert (7, 10**6, 11, 1) in got, got
    g2.restore_session_confs()


def test_hadoop_store_backend_ignores_torn_versions(spark, tmp_path):
    """A version dir without _SUCCESS (torn concurrent write) is
    invisible to listings and never resolved."""
    bk = HadoopStoreBackend(spark, f"file://{tmp_path}/s")
    os.makedirs(f"{tmp_path}/s/v00000001-deadbeef0000")
    assert bk.list_versions() == []
    assert not bk.exists("v00000001-deadbeef0000")
    open(f"{tmp_path}/s/v00000001-deadbeef0000/_SUCCESS", "w").close()
    assert bk.list_versions() == [(1, "v00000001-deadbeef0000")]
