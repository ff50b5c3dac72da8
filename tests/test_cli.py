"""CLI surface (reference python/pathway/cli.py): spawn resolves
threads x processes into SPARK_GRAFT_CPUS, replay/record wire the
reference's persistence env contract, spawn-from-env reads
$PATHWAY_SPAWN_ARGS."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROG = """
import json, os, sys
print(json.dumps({
    "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    "replay": os.environ.get("PATHWAY_REPLAY_STORAGE"),
    "access": os.environ.get("PATHWAY_SNAPSHOT_ACCESS"),
    "args": sys.argv[1:],
}))
"""


def _run(args, env_extra=None, tmp_path=None):
    prog = str(tmp_path / "prog.py")
    with open(prog, "w") as f:
        f.write(PROG)
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO
    env.update(env_extra or {})
    r = subprocess.run(
        [sys.executable, "-m", "pathway_spark", *args[:-1], prog,
         *args[-1]], capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_spawn_threads_times_processes(tmp_path):
    out = _run(["spawn", "-t", "3", "-n", "2", ["--x", "1"]],
               tmp_path=tmp_path)
    assert out["cpus"] == "6"
    assert out["args"] == ["--x", "1"]
    assert out["access"] is None


def test_spawn_record_env(tmp_path):
    out = _run(["spawn", "--record", "--record-path", "rdir", "-t", "2",
                []], tmp_path=tmp_path)
    assert out["cpus"] == "2"
    assert out["replay"] == "rdir" and out["access"] == "record"


def test_replay_env(tmp_path):
    out = _run(["replay", "--record-path", "rdir", "--mode", "speedrun",
                []], tmp_path=tmp_path)
    assert out["replay"] == "rdir" and out["access"] == "replay"


def test_spawn_from_env(tmp_path):
    prog = str(tmp_path / "prog.py")
    with open(prog, "w") as f:
        f.write(PROG)
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO
    env["PATHWAY_SPAWN_ARGS"] = f"-t 4 {prog}"
    r = subprocess.run([sys.executable, "-m", "pathway_spark",
                        "spawn-from-env"],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["cpus"] == "4"


def test_shard_worker_arg_validation():
    """shard-worker is wired into the CLI: missing required args exit
    with argparse's usage error BEFORE any Spark session spins up (the
    functional path is covered by the cross-process sharding test)."""
    import pytest
    from pathway_spark.cli import main

    with pytest.raises(SystemExit) as e:
        main(["shard-worker", "prog.py"])     # no --shard-id etc.
    assert e.value.code == 2
