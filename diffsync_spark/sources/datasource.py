"""``diffsync_table`` — a Spark 4 Python DataSource over SnapshotTable.

Makes the engine's tables first-class citizens of the DataFrame reader
API, with no JVM extension:

- ``spark.read.format("diffsync_table").option("path", p).load()`` —
  the current snapshot's live rows. Merge-on-read buckets are folded
  EXECUTOR-SIDE (one partition per bucket; pyarrow scan + a vectorized
  pandas LWW fold using the ordering rule recorded in the manifest), so
  an external consumer needs none of this package's query code.
- ``spark.readStream.format("diffsync_table").option("path", p)
  .option("feed", "changes").load()`` — a Structured Streaming tail of
  the table's COMMITTED CHANGE ROWS: each micro-batch is the delta
  layers committed since the last offset (offsets are snapshot version
  numbers, so Spark's own offset log gives exactly-once resume across
  restarts). Rows carry ``_change_type`` (upsert/delete) and
  ``_commit_version``; the stream is the LWW EVENT stream — consumers
  converge by applying last-writer-wins on the model's version columns,
  exactly as ``SnapshotTable.merge`` itself does.

Scope and honesty:

- Streaming requires the commits in range to be merge-on-read LAYER
  commits (the north-star CDC shape). A copy-on-write data commit in
  range raises: a rewritten bucket holds state, not events — use
  ``SnapshotTable.change_feed``/``stream_changes`` (which diff
  snapshots) for those, or keep streaming tables in ``write_mode=mor``.
  Maintenance commits (compact / rebucket / DDL) are logical no-ops and
  are skipped. A ``publish()`` fast-forward raises: it splices a branch's
  whole history onto main in one commit — restart the stream from the
  published version (or bootstrap the consumer again); branch commits
  themselves never appear, the reader walks MAIN's parent chain.
- Planning runs in the driver's Python worker with NO SparkSession, so
  this module reads manifests standalone; ``tests/test_datasource.py``
  pins its hydration against ``SnapshotTable._manifest`` to prevent
  drift.
- Columns resolve by parquet FIELD ID first, name second — the same
  rename-safe rule the engine's own reader uses.

Reference analog: the remote-adapter contract (a third system consuming
diffsync state, ``/root/reference/README.md`` examples) — here the
"remote system" is any Spark job, and the contract is a data source.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_FIELD_ID_KEY = "parquet.field.id"  # matches sinks/table.py
_PARQUET_FIELD_ID = b"PARQUET:field_id"


# --------------------------------------------------------------- manifests
def load_manifest(path: str, version: int | None = None) -> dict:
    """Standalone manifest read + bm-ref hydration (no SparkSession, no
    SnapshotTable): the subset of ``SnapshotTable._hydrate`` a reader
    needs — per-bucket base file lists, delta layers, the schema, and the
    recorded model declaration."""
    mdir = os.path.join(path, "manifests")
    if version is None:
        with open(os.path.join(path, "_current")) as f:
            version = int(f.read().strip())
    with open(os.path.join(mdir, f"v{version}.json")) as f:
        man = json.load(f)

    bm_cache: dict[str, dict] = {}

    def seg(ref: str) -> dict:
        fname, sid = ref.split("#", 1)
        if fname not in bm_cache:
            with open(os.path.join(mdir, "bm", fname)) as fh:
                bm_cache[fname] = json.load(fh)["segments"]
        return bm_cache[fname][sid]

    files = man.get("files") or {}
    man["files"] = {
        b: (seg(v)["files"][b] if isinstance(v, str) else v)
        for b, v in files.items()
    }
    for layer in man.get("deltas") or []:
        lf = layer["files"]
        if isinstance(lf, str):
            drop = set(layer.pop("drop", ()))
            layer["files"] = {
                b: fl for b, fl in seg(lf)["files"].items() if b not in drop
            }
    return man


def _public_schema(man: dict) -> T.StructType:
    return T.StructType.fromJson(json.loads(man["schema"]))


_CHANGE_COLS = [
    T.StructField("_seq", T.LongType(), True),
    T.StructField("_change_type", T.StringType(), False),
    T.StructField("_commit_version", T.LongType(), False),
]


# -------------------------------------------------------------- partitions
class _Part(InputPartition):
    def __init__(self, files: "list[tuple[str, int]]", kind: str,
                 commit: int = 0):
        # files: (path, commit) pairs; kind: "snapshot" | "changes"
        self.files = files
        self.kind = kind
        self.commit = commit


# ------------------------------------------------------------ worker side
def _read_file(path: str, want: T.StructType, extra: Sequence[str]):
    """Read one data file with rename-safe column resolution: match the
    table field's parquet id first, its name second; absent -> NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    by_id: dict[int, int] = {}
    for i, f in enumerate(tbl.schema):
        fid = (f.metadata or {}).get(_PARQUET_FIELD_ID)
        if fid is not None:
            by_id[int(fid)] = i
    cols, names = [], []
    n = tbl.num_rows
    for f in list(want.fields):
        fid = (f.metadata or {}).get(_FIELD_ID_KEY)
        idx = by_id.get(int(fid)) if fid is not None else None
        if idx is None and f.name in tbl.schema.names:
            idx = tbl.schema.names.index(f.name)
        cols.append(tbl.column(idx) if idx is not None
                    else pa.nulls(n, type=pa.null()))
        names.append(f.name)
    for name in extra:
        if name in tbl.schema.names:
            cols.append(tbl.column(name))
        else:
            default = {"_seq": -1, "_deleted": False, "__commit": 0}[name]
            cols.append(pa.array([default] * n))
        names.append(name)
    return pa.table(dict(zip(names, cols)))


def _cast_batches(tbl, schema: T.StructType):
    """Column-wise cast an arrow table to the Spark schema's arrow form."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    out = []
    for f in arrow_schema:
        col = tbl.column(f.name) if f.name in tbl.schema.names else None
        if col is None:
            col = pa.nulls(tbl.num_rows, type=f.type)
        out.append(col.cast(f.type))
    yield from pa.table(dict(zip(arrow_schema.names, out))).cast(
        arrow_schema).to_batches(max_chunksize=1 << 16)


def _to_batches(pdf, schema: T.StructType):
    import pyarrow as pa

    yield from _cast_batches(pa.Table.from_pandas(pdf, preserve_index=False),
                             schema)


# ----------------------------------------------------------------- readers
class _SnapshotReader(DataSourceReader):
    def __init__(self, man: dict, schema: T.StructType):
        self.man = man
        self.schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        man = self.man
        layers = man.get("deltas") or []
        parts = []
        buckets = set(man["files"]) | {b for l in layers for b in l["files"]}
        for b in sorted(buckets, key=int):
            files = [(p, 0) for p in man["files"].get(b, [])]
            files += [(p, int(l["commit"]))
                      for l in layers for p in l["files"].get(b, [])]
            if files:
                parts.append(_Part(files, "snapshot"))
        return parts

    def read(self, partition: _Part) -> Iterator:
        import pandas as pd  # noqa: F401
        import pyarrow as pa

        model = self.man.get("model") or {}
        ids = list(model.get("identifiers") or [])
        vcols = list(model.get("version_cols") or [])
        has_layers = any(c for _, c in partition.files)
        if has_layers and not ids:
            raise ValueError(
                "merge-on-read fold needs the model declaration in the "
                "manifest (tables created before round 5 lack it — run "
                "compact() once from the engine, or read via SnapshotTable)"
            )
        pieces = []
        for path, commit in partition.files:
            t = _read_file(path, self.schema, ["_seq", "_deleted"])
            t = t.append_column("__commit",
                                pa.array([commit] * t.num_rows,
                                         type=pa.int64()))
            pieces.append(t)
        if not pieces:
            return
        pdf = pa.concat_tables(pieces).to_pandas()
        if has_layers:
            # the committed LWW fold rule, EXACTLY as table.py _fold:
            # version_cols[0] DESC NULLS FIRST, _seq DESC (nulls LAST —
            # Spark desc sorts nulls last; pandas na_position is global,
            # so nulls are pre-filled with -inf), __commit ASC
            pdf["_seq"] = pdf["_seq"].astype("float64").fillna(
                float("-inf"))
            order = vcols[:1] + ["_seq", "__commit"]
            asc = [False] * len(vcols[:1]) + [False, True]
            pdf = pdf.sort_values(order, ascending=asc, na_position="first",
                                  kind="mergesort")
            pdf = pdf.drop_duplicates(subset=ids, keep="first")
        pdf = pdf[~pdf["_deleted"].fillna(False).astype(bool)]
        pdf = pdf[[f.name for f in self.schema.fields]]
        yield from _to_batches(pdf, self.schema)


class _ChangesReader(DataSourceStreamReader):
    def __init__(self, path: str, options: dict, schema: T.StructType):
        self.path = path
        self.options = {k.lower(): v for k, v in options.items()}
        self.schema = schema

    # ---- offsets: snapshot version numbers
    def initialOffset(self) -> dict:
        v = self.options.get("startingversion")
        if v is None:
            v = load_manifest(self.path)["version"]
        return {"version": int(v)}

    def latestOffset(self) -> dict:
        return {"version": load_manifest(self.path)["version"]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Walk MAIN's parent chain, not the raw number range: version
        # numbers are ONE space shared with branches, so a raw range would
        # emit unpublished branch layers into main's stream (breaking
        # write-audit-publish isolation) or trip over branch rewrites.
        lo, hi = int(start["version"]), int(end["version"])
        chain: list[tuple[int, dict]] = []
        v = hi
        while v > lo:
            try:
                man = load_manifest(self.path, v)
            except FileNotFoundError:
                raise ValueError(
                    f"snapshot v{v} in the streamed range was expired — "
                    "restart the stream from a retained version"
                ) from None
            chain.append((v, man))
            v = int(man.get("parent", v - 1))
        if v != lo:
            raise ValueError(
                f"offset v{lo} is not an ancestor of v{hi} on this ref — "
                "was the stream started from a branch version?"
            )
        parts: list[InputPartition] = []
        for v, man in reversed(chain):
            layer = next((l for l in man.get("deltas") or []
                          if int(l["commit"]) == v), None)
            if layer is not None:
                files = [(p, v) for fl in layer["files"].values() for p in fl]
                if files:
                    parts.append(_Part(files, "changes", commit=v))
                continue
            if man.get("published_from"):
                raise ValueError(
                    f"commit v{v} is a publish() fast-forward — it splices "
                    "a branch's history onto main in one commit, which this "
                    "feed cannot attribute; restart the stream from "
                    f"startingVersion={v} (re-bootstrapping the consumer) "
                    "or consume the jump via SnapshotTable.change_feed()"
                )
            if man.get("lineage"):
                raise ValueError(
                    f"commit v{v} rewrote data copy-on-write; the changes "
                    "feed streams merge-on-read layer commits only — keep "
                    "streamed tables in write_mode='mor', or consume "
                    "rewrites via SnapshotTable.change_feed()"
                )
            # maintenance / metadata commit: logical no-op, nothing to emit
        return parts

    def read(self, partition: _Part) -> Iterator:
        import pyarrow as pa

        public = T.StructType([f for f in self.schema.fields
                               if f.name not in ("_seq", "_change_type",
                                                 "_commit_version")])
        for path, commit in partition.files:
            # _seq rides along: it is the writer's monotone tiebreak, and
            # a downstream LWW apply needs it to break exact version ties
            # the same way the engine itself does. Arrow end to end — a
            # pandas round-trip would turn a NULL _seq into NaN and fail
            # the int64 cast back.
            t = _read_file(path, public, ["_seq", "_deleted"])
            deleted = t.column("_deleted").to_pylist()
            t = t.drop_columns(["_deleted"])
            t = t.append_column(
                "_change_type",
                pa.array(["delete" if d else "upsert" for d in deleted]))
            t = t.append_column(
                "_commit_version",
                pa.array([commit] * t.num_rows, type=pa.int64()))
            yield from _cast_batches(t, self.schema)

    def commit(self, end: dict) -> None:
        pass  # Spark's offset log is the source of truth


# ------------------------------------------------------------- data source
class TableDataSource(DataSource):
    """See module docstring. Options: ``path`` (required), ``feed``
    ("snapshot" default | "changes"), ``version`` (batch time travel),
    ``startingVersion`` (stream resume point; default = current at query
    start, i.e. future commits only — bootstrap via a batch read first,
    the standard CDC pattern)."""

    @classmethod
    def name(cls) -> str:
        return "diffsync_table"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("diffsync_table requires .option('path', ...)")
        return p

    def schema(self) -> T.StructType:
        v = self.options.get("version")
        man = load_manifest(self._path(), int(v) if v is not None else None)
        public = _public_schema(man)
        if self.options.get("feed", "snapshot").lower() == "changes":
            return T.StructType(list(public.fields) + _CHANGE_COLS)
        return public

    def reader(self, schema: T.StructType) -> DataSourceReader:
        if self.options.get("feed", "snapshot").lower() == "changes":
            raise ValueError(
                "feed='changes' is a streaming read — use spark.readStream"
            )
        v = self.options.get("version")
        man = load_manifest(self._path(), int(v) if v is not None else None)
        return _SnapshotReader(man, schema)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        if self.options.get("feed", "snapshot").lower() != "changes":
            raise ValueError(
                "streaming reads tail the change feed — add "
                ".option('feed', 'changes')"
            )
        return _ChangesReader(self._path(), dict(self.options), schema)


def register(spark) -> None:
    """Register the source on a session: ``format('diffsync_table')``."""
    spark.dataSource.register(TableDataSource)
