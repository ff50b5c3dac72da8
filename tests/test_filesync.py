"""Incremental object-store sync (io/filesync.py): the list→diff→
download protocol the reference runs for gdrive/sharepoint/pyfilesystem,
exercised offline against a local directory and fake API transports."""

from __future__ import annotations

import json
import os

import pytest

import pathway_spark as pw
from pathway_spark.io import filesync
from pathway_spark.io.filesync import (
    STATUS_SIZE_LIMIT_EXCEEDED,
    FileSyncSource,
    GDriveClient,
    LocalDirClient,
    SharePointClient,
    changes,
    read,
)


def _write(root, rel, data: bytes):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(data)


def test_local_static_read(spark, tmp_path):
    root = str(tmp_path)
    _write(root, "a.txt", b"alpha")
    _write(root, "sub/b.txt", b"beta")
    t = read(LocalDirClient(root), with_metadata=True, spark=spark)
    rows = {os.path.basename(json.loads(r._metadata)["path"]): r
            for r in t.to_df().collect()}
    assert rows["a.txt"].data == b"alpha"
    assert rows["b.txt"].data == b"beta"
    meta = json.loads(rows["b.txt"]._metadata)
    assert meta["status"] == "downloaded" and meta["size"] == 4


def test_pattern_and_size_limit(spark, tmp_path):
    root = str(tmp_path)
    _write(root, "keep.md", b"x" * 10)
    _write(root, "big.md", b"x" * 1000)
    _write(root, "skip.bin", b"y")
    src = FileSyncSource(LocalDirClient(root), file_name_pattern="*.md",
                         object_size_limit=100)
    ups, _ = src.poll()
    by_name = {m["name"]: m for m in ups}
    assert set(by_name) == {"keep.md", "big.md"}
    assert by_name["big.md"]["status"] == STATUS_SIZE_LIMIT_EXCEEDED
    # limit-exceeded objects surface metadata but empty payload
    t = read(LocalDirClient(root), file_name_pattern="*.md",
             object_size_limit=100, with_metadata=True, spark=spark)
    rows = {json.loads(r._metadata)["name"]: r for r in t.to_df().collect()}
    assert rows["big.md"].data == b"" and rows["keep.md"].data == b"x" * 10


def test_changes_upsert_and_remove(spark, tmp_path):
    root = str(tmp_path)
    _write(root, "a.txt", b"v1")
    it = changes(LocalDirClient(root), max_polls=3, sleep=lambda _s: None,
                 spark=spark)
    first = {json.loads(r._metadata)["path"]: r
             for r in next(it).df.collect()}
    assert first["a.txt"]._pw_diff == 1

    # modify a.txt (bump mtime) + add c.txt; poll 2 sees both as upserts
    _write(root, "a.txt", b"v2")
    os.utime(os.path.join(root, "a.txt"),
             ns=(4_000_000_000_000_000_000, 4_000_000_000_000_000_000))
    _write(root, "c.txt", b"new")
    second = {json.loads(r._metadata)["path"]: r
              for r in next(it).df.collect()}
    assert second["a.txt"]._pw_diff == 1 and second["a.txt"].data == b"v2"
    assert second["c.txt"]._pw_diff == 1

    # delete c.txt → retraction row
    os.remove(os.path.join(root, "c.txt"))
    third = {json.loads(r._metadata)["path"]: r
             for r in next(it).df.collect()}
    assert set(third) == {"c.txt"} and third["c.txt"]._pw_diff == -1


def test_executor_side_download(spark, tmp_path, monkeypatch):
    # force the mapInPandas path regardless of batch size
    monkeypatch.setattr(filesync, "_DRIVER_DOWNLOAD_LIMIT", 0)
    root = str(tmp_path)
    for i in range(5):
        _write(root, f"f{i}.txt", f"payload-{i}".encode())
    t = read(LocalDirClient(root), with_metadata=True, spark=spark)
    rows = {json.loads(r._metadata)["name"]: r.data
            for r in t.to_df().collect()}
    assert rows == {f"f{i}.txt": f"payload-{i}".encode() for i in range(5)}


class _FakeDrive:
    """Drive v3 double: folder tree with pagination on files.list."""

    def __init__(self):
        self.files = {
            "root": {"id": "root", "name": "r",
                     "mimeType": GDriveClient.MIME_FOLDER, "parents": []},
            "d1": {"id": "d1", "name": "docs",
                   "mimeType": GDriveClient.MIME_FOLDER, "parents": ["root"]},
            "f1": {"id": "f1", "name": "a.txt", "mimeType": "text/plain",
                   "parents": ["root"], "modifiedTime": "2026-01-01T00:00:00Z",
                   "size": "5"},
            "f2": {"id": "f2", "name": "b.txt", "mimeType": "text/plain",
                   "parents": ["d1"], "modifiedTime": "2026-01-02T00:00:00Z",
                   "size": "7"},
        }
        self.blobs = {"f1": b"aaaaa", "f2": b"bbbbbbb"}
        self.list_calls = 0

    def __call__(self, endpoint, **kw):
        if endpoint == "files.get":
            return self.files.get(kw["fileId"])
        if endpoint == "files.get_media":
            return self.blobs.get(kw["fileId"])
        assert endpoint == "files.list"
        self.list_calls += 1
        import re
        parents = re.findall(r"'([^']+)' in parents", kw["q"])
        kids = [f for f in self.files.values()
                if any(p in f.get("parents", []) for p in parents)]
        # one item per page to exercise pageToken handling
        tok = int(kw.get("pageToken") or 0)
        page = kids[tok:tok + 1]
        resp = {"files": page}
        if tok + 1 < len(kids):
            resp["nextPageToken"] = str(tok + 1)
        return resp


def test_gdrive_protocol(spark):
    fake = _FakeDrive()
    t = pw.io.gdrive.read("root", api_call=fake, with_metadata=True,
                          spark=spark)
    rows = {json.loads(r._metadata)["path"]: r.data
            for r in t.to_df().collect()}
    assert rows == {"a.txt": b"aaaaa", "docs/b.txt": b"bbbbbbb"}
    assert fake.list_calls >= 2  # pagination exercised

    # single-file object_id short-circuits traversal
    t2 = pw.io.gdrive.read("f1", api_call=fake, spark=spark)
    assert [r.data for r in t2.to_df().collect()] == [b"aaaaa"]


def test_gdrive_gated_without_transport():
    with pytest.raises(NotImplementedError, match="credentials"):
        pw.io.gdrive.read("root")
    with pytest.raises(NotImplementedError, match="credentials"):
        pw.io.sharepoint.read("https://x.sharepoint.com/sites/s")


def test_sharepoint_protocol(spark):
    tree = {
        "Shared Documents": [
            {"id": "i1", "name": "intro.pdf", "file": {},
             "lastModifiedDateTime": "2026-02-01T00:00:00Z", "size": 3},
            {"id": "i2", "name": "archive", "folder": {}},
        ],
        "Shared Documents/archive": [
            {"id": "i3", "name": "old.pdf", "file": {},
             "lastModifiedDateTime": "2026-01-01T00:00:00Z", "size": 4},
        ],
    }

    def api_call(endpoint, **kw):
        if endpoint == "drive.list":
            return {"value": tree.get(kw["path"], [])}
        assert endpoint == "drive.content"
        return {"i1": b"pdf", "i3": b"pdf2"}[kw["item_id"]]

    t = pw.io.sharepoint.read("https://x.sharepoint.com/sites/s",
                              api_call=api_call, with_metadata=True,
                              spark=spark)
    rows = {json.loads(r._metadata)["path"]: r.data
            for r in t.to_df().collect()}
    assert rows == {"Shared Documents/intro.pdf": b"pdf",
                    "Shared Documents/archive/old.pdf": b"pdf2"}


def test_pyfilesystem_local(spark, tmp_path):
    _write(str(tmp_path), "x/y.txt", b"z")
    t = pw.io.pyfilesystem.read(str(tmp_path), with_metadata=True,
                                spark=spark)
    [row] = t.to_df().collect()
    assert row.data == b"z"
    assert json.loads(row._metadata)["path"].endswith("y.txt")


def test_airbyte_protocol_lines(spark):
    lines = [
        json.dumps({"type": "RECORD", "record": {
            "stream": "users", "data": {"id": 1, "name": "ada"},
            "emitted_at": 1700000000000}}),
        json.dumps({"type": "STATE", "state": {"data": {"cursor": "x"}}}),
        json.dumps({"type": "RECORD", "record": {
            "stream": "orders", "data": {"id": 9},
            "emitted_at": 1700000000001}}),
        "",
    ]
    t = pw.io.airbyte.read(iter(lines), streams=["users"], spark=spark)
    [row] = t.to_df().collect()
    assert row.stream == "users" and json.loads(row.data)["name"] == "ada"

    with pytest.raises(NotImplementedError, match="Airbyte"):
        pw.io.airbyte.read()
