"""FileIO — the storage boundary for table METADATA.

Round-1 review flagged the metadata layer as POSIX-only (`open`/`os.replace`/
`O_EXCL` inline in FsTableOps).  All metadata I/O now goes through this
interface; the data plane (parquet read/write) already goes through Spark's
Hadoop filesystem layer and needs no abstraction here.

The contract an implementation must provide:

- ``write_atomic(path, text, overwrite=False)`` raising ``FileExistsError``
  when ``overwrite=False`` and the object exists — the commit primitive.
  Local: ``O_EXCL`` create.  S3: conditional put (``If-None-Match: *``).
  GCS: ``x-goods-if-generation-match: 0``.  HDFS: ``create(overwrite=false)``.
- ``replace(path, text)`` — last-writer-wins swap (version-hint).  Local:
  temp file + ``os.replace``.  Object stores: plain put (single-key puts
  are atomic).
- ``read``, ``exists``, ``delete``, ``list`` (recursive file listing), and
  ``size`` — all prefix-scoped, no directory semantics required.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator


class FileIO:
    """Interface; see module docstring for the atomicity contract."""

    def read(self, path: str) -> str:
        raise NotImplementedError

    def write_atomic(self, path: str, text: str, overwrite: bool = False) -> None:
        raise NotImplementedError

    def replace(self, path: str, text: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def delete_prefix(self, prefix: str) -> None:
        raise NotImplementedError

    def list(self, prefix: str) -> Iterator[str]:
        """All file paths under ``prefix`` (recursive)."""
        raise NotImplementedError

    def size(self, path: str) -> int | None:
        raise NotImplementedError

    def list_children(self, prefix: str) -> list[str]:
        """Immediate child names under ``prefix`` (object stores: delimiter
        listing)."""
        raise NotImplementedError

    def move_prefix(self, src: str, dst: str) -> None:
        """Move every object under ``src`` to ``dst`` (object stores: copy +
        delete; no rename primitive is assumed)."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation: ``O_EXCL`` create for conditional writes,
    temp-file + ``os.replace`` for swaps."""

    def read(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_atomic(self, path: str, text: str, overwrite: bool = False) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if overwrite:
            self.replace(path, text)
            return
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(text)

    def replace(self, path: str, text: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(path), f".{os.path.basename(path)}.{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        if os.path.exists(path):
            os.remove(path)

    def delete_prefix(self, prefix: str) -> None:
        import shutil

        if os.path.isdir(prefix):
            shutil.rmtree(prefix)
        elif os.path.exists(prefix):
            os.remove(prefix)

    def list(self, prefix: str) -> Iterator[str]:
        if os.path.isfile(prefix):
            yield prefix
            return
        for root, _dirs, files in os.walk(prefix):
            for fn in sorted(files):
                yield os.path.join(root, fn)

    def size(self, path: str) -> int | None:
        return os.path.getsize(path) if os.path.exists(path) else None

    def list_children(self, prefix: str) -> list[str]:
        if not os.path.isdir(prefix):
            return []
        return sorted(os.listdir(prefix))

    def move_prefix(self, src: str, dst: str) -> None:
        import shutil

        shutil.move(src, dst)
