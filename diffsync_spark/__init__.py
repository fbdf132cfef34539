"""diffsync_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Generalizes the keyed compare-and-sync semantics of networktocode/diffsync
(reference at /root/reference, studied for behavior only) to lakehouse scale:

- ``ModelSchema``      — declared keyed/typed record schema (identifiers /
  attributes / children), mirroring the reference's ``DiffSyncModel`` contract
  (``diffsync/__init__.py:61-159``) as DataFrame metadata.
- ``diff``             — the core keyed full-outer diff with per-key
  create/update/delete/noop classification and attribute-level before/after
  deltas (``diffsync/helpers.py:102-234``, ``diffsync/diff.py:236-305``),
  expressed as a single Catalyst plan (or an Arrow cogroup for custom
  semantics).
- ``lww_dedup``        — last-writer-wins window dedup by ``(ts, seq)``.
- ``SnapshotTable``    — an Iceberg-style transactional parquet table:
  bucketed layout, snapshot manifests, MERGE upsert with tombstones,
  schema evolution, per-batch lineage, idempotent exactly-once commits.
- ``replay`` / ``stream_replay`` — batch and Structured Streaming replay of a
  changelog into the target table, resumable from checkpoint.
- ``functions``        — large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).

Everything is DataFrame-first: Catalyst does pushdown/pruning/codegen; Python
touches data only through vectorized Arrow batches (never per-row).
"""

from diffsync_spark.model import ModelSchema, TRANSCRIPT_MODEL
from diffsync_spark.flags import DiffFlags
from diffsync_spark.engine import Engine
from diffsync_spark.operators.diff import diff, diff_summary
from diffsync_spark.operators.hierarchy import HierarchySync
from diffsync_spark.operators.lww import lww_dedup
from diffsync_spark.session import build_session
from diffsync_spark.sinks.fsio import LocalCommitIO
from diffsync_spark.sinks.table import SnapshotTable

__all__ = [
    "ModelSchema",
    "TRANSCRIPT_MODEL",
    "DiffFlags",
    "Engine",
    "HierarchySync",
    "LocalCommitIO",
    "SnapshotTable",
    "diff",
    "diff_summary",
    "lww_dedup",
    "build_session",
]

__version__ = "0.1.0"
