"""Incremental object-store sync — gdrive / sharepoint / pyfilesystem.

The reference implements each of these as a polling loop that lists the
remote tree, diffs it against the previous snapshot, downloads new and
modified objects and retracts removed ones (gdrive
`python/pathway/io/gdrive/__init__.py:403` `_GDriveTree` diff +
`_GDriveSubject.run`; sharepoint
`python/pathway/xpacks/connectors/sharepoint` `_SharePointScanner.
get_snapshot_diff`; pyfilesystem `python/pathway/io/pyfilesystem`).

This module re-expresses that state machine once, with the transport
INJECTED (`SyncClient`), so the protocol logic is real and offline-
testable; the hosted-service transports (Google Drive API, Microsoft
Graph) are thin client subclasses gated on credentials.

Scale design: the list→diff conversation is inherently a driver-side
API dialogue (cheap: metadata only), but payload download fans out to
executors — the changed-file list becomes a DataFrame and bytes are
fetched inside `mapInPandas`, so at 100 TB the object payloads never
squeeze through the driver. A small-batch fast path downloads on the
driver to skip a job for interactive use.
"""

from __future__ import annotations

import fnmatch
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ID, Table

# status values (reference python/pathway/io/_utils.py STATUS_*)
STATUS_DOWNLOADED = "downloaded"
STATUS_SIZE_LIMIT_EXCEEDED = "size_limit_exceeded"

# below this many changed objects a driver-side download loop beats the
# cost of scheduling a Spark job; above it, downloads run on executors.
_DRIVER_DOWNLOAD_LIMIT = 64

_META_FIELDS = ("id", "name", "path", "modified_at", "size")


class SyncClient:
    """Transport interface: list the remote tree, fetch one payload.

    ``list_objects`` returns one dict per non-directory object with at
    least ``id`` (stable), ``name``, ``path``, ``modified_at`` (any
    comparable — the diff only uses ``>``), ``size`` (bytes).
    """

    def list_objects(self) -> list[dict]:
        raise NotImplementedError

    def download(self, meta: dict) -> bytes | None:
        raise NotImplementedError


class LocalDirClient(SyncClient):
    """Directory-backed client: the pyfilesystem OSFS equivalent and the
    offline test double for the hosted transports."""

    def __init__(self, root: str, path: str = ""):
        self.root = os.path.abspath(root)
        self.path = path

    def list_objects(self) -> list[dict]:
        base = os.path.join(self.root, self.path) if self.path else self.root
        out: list[dict] = []
        for dirpath, _dirs, files in os.walk(base):
            for fn in sorted(files):
                full = os.path.join(dirpath, fn)
                try:
                    st = os.stat(full)
                except FileNotFoundError:  # raced with a delete
                    continue
                rel = os.path.relpath(full, self.root)
                out.append({
                    "id": rel,
                    "name": fn,
                    "path": rel,
                    "modified_at": st.st_mtime_ns,
                    "size": st.st_size,
                })
        return out

    def download(self, meta: dict) -> bytes | None:
        try:
            with open(os.path.join(self.root, meta["path"]), "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None


class GDriveClient(SyncClient):
    """Google Drive transport over an injected ``api_call``.

    ``api_call(endpoint, **params)`` must answer two endpoints mirroring
    the public Drive v3 API: ``files.list`` (kwargs ``q``, ``pageToken``;
    returns ``{"files": [...], "nextPageToken": ...}`` with file fields
    ``id, name, mimeType, parents, modifiedTime, trashed, size``) and
    ``files.get_media`` (kwarg ``fileId``; returns bytes). Folder
    traversal batches parent ids per request like the reference
    (gdrive/__init__.py:56 `_MAX_ITEMS_PER_LIST_REQUEST`).
    """

    MIME_FOLDER = "application/vnd.google-apps.folder"
    _MAX_PARENTS_PER_QUERY = 32

    def __init__(self, object_id: str, api_call: Callable[..., Any]):
        self.object_id = object_id
        self.api_call = api_call

    def _list_children(self, parent_ids: list[str]) -> list[dict]:
        clause = " or ".join(f"'{p}' in parents" for p in parent_ids)
        files, token = [], None
        while True:
            resp = self.api_call(
                "files.list", q=f"({clause}) and trashed = false",
                pageToken=token)
            files.extend(resp.get("files", []))
            token = resp.get("nextPageToken")
            if not token:
                return files

    def list_objects(self) -> list[dict]:
        # treat the root as a file first; fall back to folder traversal
        root = self.api_call("files.get", fileId=self.object_id)
        if root is not None and root.get("mimeType") != self.MIME_FOLDER:
            return [self._to_meta(root, parent_path="")]
        out: list[dict] = []
        frontier = [(self.object_id, "")]
        while frontier:
            batch, frontier = (frontier[:self._MAX_PARENTS_PER_QUERY],
                               frontier[self._MAX_PARENTS_PER_QUERY:])
            paths = dict(batch)
            for f in self._list_children([b[0] for b in batch]):
                parent = next((p for p in f.get("parents", []) if p in paths),
                              batch[0][0])
                ppath = paths.get(parent, "")
                if f.get("mimeType") == self.MIME_FOLDER:
                    frontier.append(
                        (f["id"], f"{ppath}{f['name']}/"))
                else:
                    out.append(self._to_meta(f, parent_path=ppath))
        return out

    @staticmethod
    def _to_meta(f: dict, *, parent_path: str) -> dict:
        return {
            "id": f["id"],
            "name": f["name"],
            "path": parent_path + f["name"],
            "modified_at": f.get("modifiedTime", ""),
            "size": int(f.get("size", 0) or 0),
        }

    def download(self, meta: dict) -> bytes | None:
        return self.api_call("files.get_media", fileId=meta["id"])


class SharePointClient(SyncClient):
    """SharePoint (Microsoft Graph drive) transport over an injected
    ``api_call``; endpoints mirror the public Graph API:
    ``drive.list`` (kwarg ``path``; returns ``{"value": [items with
    id/name/folder?/file?/lastModifiedDateTime/size/parentReference]}``)
    and ``drive.content`` (kwarg ``item_id``; returns bytes)."""

    def __init__(self, root_path: str, api_call: Callable[..., Any]):
        self.root_path = root_path.rstrip("/")
        self.api_call = api_call

    def list_objects(self) -> list[dict]:
        out: list[dict] = []
        frontier = [self.root_path]
        while frontier:
            path = frontier.pop()
            for item in self.api_call("drive.list", path=path).get("value", []):
                child = f"{path}/{item['name']}"
                if "folder" in item:
                    frontier.append(child)
                else:
                    out.append({
                        "id": item["id"],
                        "name": item["name"],
                        "path": child,
                        "modified_at": item.get("lastModifiedDateTime", ""),
                        "size": int(item.get("size", 0) or 0),
                    })
        return out

    def download(self, meta: dict) -> bytes | None:
        return self.api_call("drive.content", item_id=meta["id"])


# ------------------------------------------------------------------ diff

def snapshot_diff(prev: dict[str, dict], cur: list[dict]
                  ) -> tuple[list[dict], list[dict]]:
    """(upserts, removals) — new ids, ids whose ``modified_at`` advanced,
    and ids that vanished (reference _GDriveTree.new_and_changed_files /
    removed_files, gdrive/__init__.py:406-424)."""
    cur_by_id = {m["id"]: m for m in cur}
    upserts = [m for i, m in cur_by_id.items()
               if i not in prev or m["modified_at"] > prev[i]["modified_at"]]
    removals = [m for i, m in prev.items() if i not in cur_by_id]
    return upserts, removals


@dataclass
class FileSyncSource:
    """Driver-side sync state machine. ``poll()`` lists, filters, diffs
    against the retained snapshot and returns (upserts, removals)."""

    client: SyncClient
    file_name_pattern: str | list[str] | None = None
    object_size_limit: int | None = None
    _snapshot: dict[str, dict] = field(default_factory=dict)

    def _filter(self, metas: list[dict]) -> list[dict]:
        pats = self.file_name_pattern
        if pats is not None:
            pats = [pats] if isinstance(pats, str) else list(pats)
            metas = [m for m in metas
                     if any(fnmatch.fnmatch(m["name"], p) for p in pats)]
        if self.object_size_limit is not None:
            for m in metas:
                m["status"] = (STATUS_DOWNLOADED
                               if m["size"] <= self.object_size_limit
                               else STATUS_SIZE_LIMIT_EXCEEDED)
        else:
            for m in metas:
                m["status"] = STATUS_DOWNLOADED
        return metas

    def poll(self) -> tuple[list[dict], list[dict]]:
        cur = self._filter(self.client.list_objects())
        upserts, removals = snapshot_diff(self._snapshot, cur)
        self._snapshot = {m["id"]: m for m in cur}
        return upserts, removals


# ---------------------------------------------------------- table builder

_ROW_TYPE = T.StructType([
    T.StructField("data", T.BinaryType()),
    T.StructField("_metadata", T.StringType()),
    T.StructField("path", T.StringType()),
])


def _meta_json(m: dict) -> str:
    return json.dumps({k: m.get(k) for k in (*_META_FIELDS, "status")},
                      sort_keys=True, default=str)


def _download_rows_driver(client: SyncClient, metas: list[dict],
                          only_metadata: bool) -> list[tuple]:
    rows = []
    for m in metas:
        if only_metadata or m.get("status") == STATUS_SIZE_LIMIT_EXCEEDED:
            payload = b""
        else:
            payload = client.download(m)
            if payload is None:  # vanished between list and fetch
                continue
        rows.append((payload, _meta_json(m), m["path"]))
    return rows


def _download_df(spark: SparkSession, client: SyncClient,
                 metas: list[dict], only_metadata: bool) -> DataFrame:
    """Changed-file payload fetch. Small batches loop on the driver;
    large ones ship the meta list as a DataFrame and fetch inside
    mapInPandas on executors (the 100 TB path — payload bytes move
    executor-side only)."""
    if only_metadata or len(metas) <= _DRIVER_DOWNLOAD_LIMIT:
        rows = _download_rows_driver(client, metas, only_metadata)
        return spark.createDataFrame(rows, _ROW_TYPE)

    meta_df = spark.createDataFrame(
        [(json.dumps(m, default=str),) for m in metas], "meta_json string"
    ).repartition(min(len(metas), 256))

    def fetch(batches):
        import pandas as pd
        for pdf in batches:
            out = []
            for mj in pdf["meta_json"]:
                m = json.loads(mj)
                if m.get("status") == STATUS_SIZE_LIMIT_EXCEEDED:
                    out.append((b"", _meta_json(m), m["path"]))
                    continue
                payload = client.download(m)
                if payload is not None:
                    out.append((payload, _meta_json(m), m["path"]))
            yield pd.DataFrame(out, columns=["data", "_metadata", "path"])

    return meta_df.mapInPandas(fetch, _ROW_TYPE)


def _to_table(df: DataFrame, *, with_metadata: bool,
              only_metadata: bool) -> Table:
    df = df.withColumn(ID, F.xxhash64(F.col("path")))
    cols = [ID]
    if not only_metadata:
        cols.append("data")
    if with_metadata or only_metadata:
        cols.append("_metadata")
    return Table(df.select(*cols))


def read(client: SyncClient, *, mode: str = "static",
         format: str = "binary", with_metadata: bool = False,
         file_name_pattern: str | list[str] | None = None,
         object_size_limit: int | None = None,
         refresh_interval: float = 30.0,
         spark: SparkSession | None = None) -> Table:
    """Static snapshot read (one list+download pass) — the reference's
    ``mode="static"`` contract (gdrive/__init__.py:519 read()). For the
    polling mode use :func:`changes`."""
    assert mode == "static", "use changes() for streaming sync"
    assert format in ("binary", "only_metadata")
    if spark is None:
        from ..session import get_spark
        spark = get_spark()
    src = FileSyncSource(client, file_name_pattern, object_size_limit)
    upserts, _ = src.poll()
    df = _download_df(spark, client, upserts, format == "only_metadata")
    return _to_table(df, with_metadata=with_metadata,
                     only_metadata=format == "only_metadata")


def changes(client: SyncClient, *, max_polls: int | None = None,
            refresh_interval: float = 30.0, format: str = "binary",
            file_name_pattern: str | list[str] | None = None,
            object_size_limit: int | None = None,
            sleep: Callable[[float], None] = time.sleep,
            spark: SparkSession | None = None) -> Iterator[Table]:
    """Streaming sync as a change-stream iterator: each poll yields a
    Table with ``_pw_diff`` (+1 upsert, -1 removal), the same retraction
    contract our subscribe/streaming layer uses. ``max_polls``/``sleep``
    are injectable for tests; the production loop is unbounded."""
    assert format in ("binary", "only_metadata")
    if spark is None:
        from ..session import get_spark
        spark = get_spark()
    src = FileSyncSource(client, file_name_pattern, object_size_limit)
    polls = 0
    while max_polls is None or polls < max_polls:
        if polls:
            sleep(refresh_interval)
        upserts, removals = src.poll()
        polls += 1
        if not upserts and not removals:
            continue
        up_df = _download_df(spark, client, upserts,
                             format == "only_metadata")
        up_df = up_df.withColumn("_pw_diff", F.lit(1))
        rm_rows = [(b"", _meta_json(m), m["path"]) for m in removals]
        rm_df = (spark.createDataFrame(rm_rows, _ROW_TYPE)
                 .withColumn("_pw_diff", F.lit(-1)))
        df = up_df.unionByName(rm_df).withColumn(
            ID, F.xxhash64(F.col("path")))
        yield Table(df.select(ID, "data", "_metadata", "_pw_diff"))


# ------------------------------------------------------- pw.io surfaces

def gdrive_read(object_id: str, *, api_call: Callable[..., Any] | None = None,
                mode: str = "static", format: str = "binary",
                with_metadata: bool = False,
                file_name_pattern: str | list[str] | None = None,
                object_size_limit: int | None = None,
                service_user_credentials_file: str | None = None,
                refresh_interval: float = 30.0, **_compat) -> Table:
    """reference python/pathway/io/gdrive/__init__.py:519. The Drive
    transport needs service-account credentials + google-api client
    (absent here); inject ``api_call`` to run the full protocol."""
    if api_call is None:
        raise NotImplementedError(
            "io.gdrive.read requires Google service-account credentials "
            "and the google-api-python-client transport; pass api_call= "
            "to run the sync protocol against another transport "
            "(see pathway_spark/io/filesync.py).")
    return read(GDriveClient(object_id, api_call), mode=mode, format=format,
                with_metadata=with_metadata,
                file_name_pattern=file_name_pattern,
                object_size_limit=object_size_limit,
                refresh_interval=refresh_interval)


def sharepoint_read(url: str, *, api_call: Callable[..., Any] | None = None,
                    root_path: str = "Shared Documents",
                    mode: str = "static", with_metadata: bool = False,
                    object_size_limit: int | None = None,
                    refresh_interval: float = 30.0, **_compat) -> Table:
    """reference python/pathway/xpacks/connectors/sharepoint read()."""
    if api_call is None:
        raise NotImplementedError(
            "io.sharepoint.read requires SharePoint credentials and the "
            "Office365-REST client; pass api_call= to run the sync "
            "protocol against another transport "
            "(see pathway_spark/io/filesync.py).")
    return read(SharePointClient(root_path, api_call), mode=mode,
                with_metadata=with_metadata,
                object_size_limit=object_size_limit,
                refresh_interval=refresh_interval)


def pyfilesystem_read(source: Any, *, path: str = "",
                      mode: str = "static", format: str = "binary",
                      with_metadata: bool = False, **kw) -> Table:
    """reference python/pathway/io/pyfilesystem/__init__.py:159. Accepts
    a local directory path (OSFS equivalent), a SyncClient, or an fs.FS
    object when the optional ``fs`` package is installed."""
    if isinstance(source, SyncClient):
        client: SyncClient = source
    elif isinstance(source, (str, os.PathLike)):
        client = LocalDirClient(os.fspath(source), path)
    else:  # fs.FS duck-type: walk.files / getinfo / readbytes
        client = _FSWrapper(source, path)
    return read(client, mode=mode, format=format,
                with_metadata=with_metadata, **kw)


class _FSWrapper(SyncClient):
    """Adapter for PyFilesystem FS objects (fs package, optional)."""

    def __init__(self, fs_obj: Any, path: str):
        self.fs = fs_obj
        self.path = path or "/"

    def list_objects(self) -> list[dict]:
        out = []
        for p in self.fs.walk.files(self.path):
            info = self.fs.getinfo(p, namespaces=["details"])
            out.append({
                "id": p, "name": info.name, "path": p,
                "modified_at": (info.modified.isoformat()
                                if info.modified else ""),
                "size": info.size or 0,
            })
        return out

    def download(self, meta: dict) -> bytes | None:
        try:
            return self.fs.readbytes(meta["path"])
        except Exception:
            return None
