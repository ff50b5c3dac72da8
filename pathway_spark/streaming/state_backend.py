"""Durable-state storage backends for the differential engine.

The reference persists its engine state to either a filesystem or an
object store (`/root/reference/src/persistence/backends/mod.rs`,
`backends/s3.rs`); this module gives `_StateStore` /
`DifferentialGraph.commit` the same choice, behind two tiny contracts:

- a **store backend** publishes immutable parquet VERSIONS of one
  state store and lists/vacuums them;
- a **meta backend** persists the graph's commit record (logical
  clock + the version token each store committed).

Two implementations:

`LocalStoreBackend` / `LocalMetaBackend` — driver-local POSIX paths.
Publication is an atomic directory RENAME out of a hidden staging dir,
and the version NUMBER is claimed by the rename itself (a concurrent
writer/compactor that already took it forces a retry with the next
number); the meta swap is `os.replace`.  This is the round-7 protocol,
unchanged.

`HadoopStoreBackend` / `HadoopMetaBackend` — any URI the Hadoop
FileSystem API resolves (s3a://, gs://, abfs://, hdfs://, file://).
Object stores have NO atomic rename, so the protocol is RENAME-FREE,
the same shape as Delta's log (public design):

- a version is written DIRECTLY to its final, uuid-suffixed directory
  `v{ordinal:08d}-{uuid12}`: unique names make concurrent writers
  collision-free without a claim step, and Spark's `_SUCCESS` marker
  (written at job commit) is the completeness witness — listings
  ignore dirs without it, so a torn write is invisible garbage;
- the commit record is an append-only log `_meta/{seq:012d}-{uuid}.json`
  where the committed meta is the ENTRY WITH THE HIGHEST (seq, name);
  writing a new seq is one atomic object PUT, and two racing committers
  write different names so the order is total and deterministic;
- a version only becomes THE committed one when a meta entry references
  its token, exactly like the local protocol.

Everything here is driver-side control-plane IO (listings, tiny JSON);
the data plane (parquet read/write) goes through Spark itself, which
already speaks every Hadoop filesystem.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def make_backends(spark, state_dir: str):
    """(store_backend_factory, meta_backend) for a state_dir that is
    either a driver-local path or a Hadoop-resolvable URI."""
    if "://" in state_dir:
        meta = HadoopMetaBackend(spark, state_dir)
        return (lambda key: HadoopStoreBackend(
            spark, f"{state_dir.rstrip('/')}/store_{key}")), meta
    meta = LocalMetaBackend(state_dir)
    return (lambda key: LocalStoreBackend(
        f"{state_dir}/store_{key}")), meta


# ---------------------------------------------------------------------------
# driver-local POSIX (rename-claim protocol)
# ---------------------------------------------------------------------------


class LocalStoreBackend:
    def __init__(self, path: str):
        self.path = path

    def list_versions(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            if d.startswith("v") and d[1:].isdigit():
                out.append((int(d[1:]), d))
        return sorted(out)

    @staticmethod
    def ordinal(token: str) -> int:
        return int(str(token).lstrip("v").split("-")[0]) \
            if isinstance(token, str) else int(token)

    def uri(self, token) -> str:
        if not isinstance(token, str):       # pre-r8 metas stored ints
            token = f"v{int(token):08d}"
        return f"{self.path}/{token}"

    def publish(self, want: int, write_fn) -> tuple[int, str]:
        """Stage, then atomically rename-claim the first free ordinal
        >= want.  `write_fn(uri)` must fully write the version data."""
        stage = f"{self.path}/.staging-{uuid.uuid4().hex}"
        write_fn(stage)
        while True:
            token = f"v{want:08d}"
            dest = f"{self.path}/{token}"
            try:
                os.rename(stage, dest)
                return want, token
            except OSError:
                if not os.path.isdir(dest):
                    raise     # not a version collision — real IO error
                want += 1     # another writer claimed it: take the next

    def vacuum_below(self, below: int) -> None:
        for ordn, name in self.list_versions():
            if ordn < below:
                shutil.rmtree(f"{self.path}/{name}", ignore_errors=True)

    def exists(self, token) -> bool:
        return os.path.isdir(self.uri(token))


class LocalMetaBackend:
    def __init__(self, root: str):
        self.root = root

    def _p(self) -> str:
        return f"{self.root}/_meta.json"

    def load(self) -> dict | None:
        if not os.path.isfile(self._p()):
            return None
        with open(self._p()) as f:
            return json.load(f)

    def commit(self, meta: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._p() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._p())           # the atomic commit point


# ---------------------------------------------------------------------------
# Hadoop FileSystem URIs (rename-free protocol)
# ---------------------------------------------------------------------------


class _HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem."""

    def __init__(self, spark, base_uri: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(
            self._jvm.java.net.URI(base_uri), self._conf)

    def listdir(self, uri: str) -> list[str]:
        p = self._Path(uri)
        if not self._fs.exists(p):
            return []
        out = []
        for st in self._fs.listStatus(p):
            out.append(st.getPath().getName())
        return out

    def exists(self, uri: str) -> bool:
        return self._fs.exists(self._Path(uri))

    def delete(self, uri: str) -> None:
        self._fs.delete(self._Path(uri), True)

    def read_text(self, uri: str) -> str:
        stream = self._fs.open(self._Path(uri))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()

    def write_text(self, uri: str, text: str) -> None:
        # one PUT, no rename: object-store puts are atomic per object
        stream = self._fs.create(self._Path(uri), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()


class HadoopStoreBackend:
    """Rename-free version store over any Hadoop filesystem."""

    def __init__(self, spark, path_uri: str):
        self.path = path_uri.rstrip("/")
        self._fs = _HadoopFS(spark, path_uri)

    def list_versions(self) -> list[tuple[int, str]]:
        out = []
        for name in self._fs.listdir(self.path):
            if not (name.startswith("v") and "-" in name):
                continue
            head = name[1:].split("-", 1)[0]
            if not head.isdigit():
                continue
            # Spark writes _SUCCESS at job commit — the completeness
            # witness that makes torn concurrent writes invisible
            if self._fs.exists(f"{self.path}/{name}/_SUCCESS"):
                out.append((int(head), name))
        return sorted(out)

    @staticmethod
    def ordinal(token: str) -> int:
        return int(str(token).lstrip("v").split("-")[0])

    def uri(self, token: str) -> str:
        return f"{self.path}/{token}"

    def publish(self, want: int, write_fn) -> tuple[int, str]:
        """Write straight to a uuid-suffixed final directory — unique
        names need no claim step; visibility comes from _SUCCESS."""
        token = f"v{want:08d}-{uuid.uuid4().hex[:12]}"
        write_fn(f"{self.path}/{token}")
        return want, token

    def vacuum_below(self, below: int) -> None:
        for ordn, name in self.list_versions():
            if ordn < below:
                self._fs.delete(f"{self.path}/{name}")

    def exists(self, token: str) -> bool:
        return self._fs.exists(f"{self.path}/{token}/_SUCCESS")


class HadoopMetaBackend:
    """Append-only commit log: `_meta/{seq:012d}-{uuid}.json`; the
    committed record is the lexicographically greatest name (seq is
    zero-padded, so name order == (seq, uuid) order).  One atomic PUT
    per commit; racing committers write different names, giving a
    total, deterministic order with no compare-and-swap primitive."""

    def __init__(self, spark, root_uri: str):
        self.root = root_uri.rstrip("/")
        self._fs = _HadoopFS(spark, root_uri)

    def _entries(self) -> list[str]:
        return sorted(n for n in self._fs.listdir(f"{self.root}/_meta")
                      if n.endswith(".json"))

    def load(self) -> dict | None:
        entries = self._entries()
        if not entries:
            return None
        return json.loads(
            self._fs.read_text(f"{self.root}/_meta/{entries[-1]}"))

    def commit(self, meta: dict) -> None:
        entries = self._entries()
        seq = (int(entries[-1].split("-", 1)[0]) + 1) if entries else 1
        name = f"{seq:012d}-{uuid.uuid4().hex[:12]}.json"
        self._fs.write_text(f"{self.root}/_meta/{name}",
                            json.dumps(meta))
