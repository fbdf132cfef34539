"""Commit-metadata I/O seam for :class:`SnapshotTable`.

Everything the sink does OUTSIDE Spark — manifest read/write, the atomic
current-version pointer, data-file listing for lineage/compaction — goes
through this interface, so a 100 TB deployment swaps one object for:

- **S3/GCS**: ``write_exclusive`` → conditional PUT (``If-None-Match: *``;
  native on GCS and on S3 since 2024), ``write_atomic`` → a catalog/metastore
  pointer swap (e.g. DynamoDB conditional update or the Glue/Nessie catalog),
  ``list_files`` → a prefix listing.
- **Real Iceberg**: this whole layer *is* the catalog commit — the sink's
  manifest chain maps 1:1 onto Iceberg snapshots + metadata.json, with
  ``write_exclusive`` playing optimistic-concurrency commit.

The default :class:`LocalCommitIO` is the sandbox/posix implementation.
"""

from __future__ import annotations

import os


class LocalCommitIO:
    """POSIX implementation — also the interface contract (duck-typed).

    Methods raise the same exceptions the sink's commit protocol relies on:
    ``write_exclusive`` raises ``FileExistsError`` on a concurrent commit of
    the same version; ``read_text`` raises ``FileNotFoundError`` for a
    missing pointer/manifest.
    """

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_exclusive(self, path: str, text: str) -> None:
        """Create-if-absent, fail-if-present — the commit conflict detector."""
        with open(path, "x") as f:
            f.write(text)

    def write_atomic(self, path: str, text: str) -> None:
        """Atomically replace the pointer file (readers never see a torn
        write). Object-store analog: catalog CAS, not a file at all."""
        import uuid

        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def compare_and_swap(self, path: str, expected: str, new: str) -> bool:
        """Atomically replace ``path`` with ``new`` ONLY if its current
        content equals ``expected``; returns whether the swap happened.
        This is the ref-pointer swing primitive: a stale writer (crash
        roll-forward, reaped-token survivor) must never move the pointer
        off a state it didn't observe. Object-store analog: DynamoDB
        conditional update / Nessie commit — a native CAS, no lock file.

        Locally, a dot-prefixed sidecar lock (``.<name>.ptrlock`` next to
        the pointer, never replaced so flock stays attached to one inode)
        serializes read-compare-replace across processes."""
        import fcntl

        d, base = os.path.split(path)
        lock = os.path.join(d, f".{base}.ptrlock")
        with open(lock, "a+") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                try:
                    cur = self.read_text(path).strip()
                except FileNotFoundError:
                    return False
                if cur != expected.strip():
                    return False
                self.write_atomic(path, new)
                return True
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_dirs(self, path: str) -> list[str]:
        """Immediate subdirectory names ([] when absent)."""
        if not os.path.isdir(path):
            return []
        return sorted(
            d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))
        )

    def list_files(self, path: str) -> list[str]:
        """Immediate file names ([] when absent)."""
        if not os.path.isdir(path):
            return []
        return sorted(
            f for f in os.listdir(path) if os.path.isfile(os.path.join(path, f))
        )

    def remove_file(self, path: str) -> None:
        """Delete one file, tolerating absence (object-store DELETE)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def remove_dir(self, path: str) -> None:
        """Recursively delete a directory tree, tolerating absence
        (object-store prefix delete)."""
        import shutil

        shutil.rmtree(path, ignore_errors=True)


class RacingCommitIO(LocalCommitIO):
    """Deterministic commit-race injector (object-store shape, for tests).

    The first ``races`` calls to ``write_exclusive`` first run
    ``interloper()`` — e.g. a second writer's full ``merge()`` through its
    own table handle — and only then attempt the exclusive write, which now
    collides with whatever version the interloper committed. This is
    exactly the conditional-PUT race an S3/GCS catalog backend loses when
    another worker commits first; the sink's retry loop must rebase and
    re-commit."""

    def __init__(self, interloper, races: int = 1) -> None:
        self.interloper = interloper
        self.races = races
        self.n_raced = 0

    def write_exclusive(self, path: str, text: str) -> None:
        if self.n_raced < self.races:
            self.n_raced += 1
            self.interloper()
        super().write_exclusive(path, text)


class InMemoryManifestIO(LocalCommitIO):
    """Commit metadata in memory, data-file listing still on the local FS —
    proves the seam: the sink runs with NO manifest/pointer disk I/O (the
    shape of an object-store catalog backend). Used by tests."""

    def __init__(self) -> None:
        import threading

        self.blobs: dict[str, str] = {}
        self.dirs: set[str] = set()
        self._cas_lock = threading.Lock()

    def compare_and_swap(self, path: str, expected: str, new: str) -> bool:
        with self._cas_lock:
            cur = self.blobs.get(path)
            if cur is None or cur.strip() != expected.strip():
                return False
            self.blobs[path] = new
            return True

    def read_text(self, path: str) -> str:
        if path not in self.blobs:
            raise FileNotFoundError(path)
        return self.blobs[path]

    def write_exclusive(self, path: str, text: str) -> None:
        if path in self.blobs:
            raise FileExistsError(path)
        self.blobs[path] = text

    def write_atomic(self, path: str, text: str) -> None:
        self.blobs[path] = text

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        if not exist_ok and path in self.dirs:
            raise FileExistsError(path)
        self.dirs.add(path)

    def exists(self, path: str) -> bool:
        return path in self.blobs or path in self.dirs or os.path.exists(path)

    def remove_file(self, path: str) -> None:
        if path in self.blobs:
            del self.blobs[path]
        else:
            super().remove_file(path)  # data files live on the local FS
