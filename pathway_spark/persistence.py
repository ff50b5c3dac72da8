"""`pw.persistence` — exactly-once restart configuration.

Reference: `python/pathway/persistence/__init__.py:13/116` (Backend,
Config). Structured Streaming's checkpoint + write-ahead log IS the
reference's persistence layer (SURVEY §2.11): `Config(backend)` maps to
a `checkpointLocation` that every started streaming query uses.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Backend:
    uri: str

    @classmethod
    def filesystem(cls, path: str) -> "Backend":
        return cls(uri=path)

    @classmethod
    def s3(cls, root_path: str, bucket_settings=None) -> "Backend":
        return cls(uri=root_path if root_path.startswith("s3") else f"s3a://{root_path}")

    @classmethod
    def azure(cls, root_path: str, **kw) -> "Backend":
        return cls(uri=root_path)


@dataclass
class Config:
    backend: Backend
    snapshot_interval_ms: int = 0

    @property
    def checkpoint_location(self) -> str:
        return self.backend.uri

    def apply(self, write_stream):
        """Attach the checkpoint to a DataStreamWriter."""
        return write_stream.option("checkpointLocation", self.checkpoint_location)
