"""Structured Streaming replay: end-to-end, checkpoint resume, exactly-once."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.oracle import OracleStore
from diffsync_spark.sinks.table import SnapshotTable
from diffsync_spark.streaming.replay import stream_replay

IDS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "ts"]
CHANGELOG_DDL = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _write_changelog_files(spark, changelog_pdf, out_dir: str, n_files: int = 6):
    """Append-only changelog dir: contiguous seq ranges, one parquet file each
    (the binlog-segment stand-in)."""
    os.makedirs(out_dir, exist_ok=True)
    span = (len(changelog_pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = changelog_pdf.iloc[i * span : (i + 1) * span]
        if len(part):
            spark.createDataFrame(part).coalesce(1).write.mode("append").parquet(
                out_dir
            )


@pytest.fixture()
def table(spark, tmp_path, target_df):
    t = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), TRANSCRIPT_MODEL,
        schema=target_df.schema, n_buckets=8,
    )
    t.merge(target_df.withColumn("op", F.lit("insert")), mode="force",
            checkpoint_id="bootstrap", batch_id=0)
    return t


def _oracle_final(target_pdf, changelog_pdf) -> pd.DataFrame:
    store = OracleStore.from_snapshot(target_pdf, IDS, PAYLOAD)
    store.apply_changelog(changelog_pdf)
    return store.final_df().sort_values(IDS).reset_index(drop=True)


def _state(table) -> pd.DataFrame:
    return table.read().toPandas().sort_values(IDS).reset_index(drop=True)


def test_stream_replay_end_to_end(spark, tmp_path, table, target_pdf, changelog_pdf):
    log_dir = str(tmp_path / "changelog")
    _write_changelog_files(spark, changelog_pdf, log_dir)
    q = stream_replay(
        table, log_dir, CHANGELOG_DDL, str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    want = _oracle_final(target_pdf, changelog_pdf)
    got = _state(table)
    assert len(got) == len(want)
    assert list(got["text"].fillna("∅")) == list(want["text"].fillna("∅"))


def test_stream_resume_from_checkpoint(spark, tmp_path, table, target_pdf,
                                       changelog_pdf):
    """Stop mid-stream, restart with the same checkpoint → converges to the
    same final state; already-applied batches are not re-applied."""
    log_dir = str(tmp_path / "changelog")
    ckpt = str(tmp_path / "ckpt")
    half = len(changelog_pdf) // 2
    _write_changelog_files(spark, changelog_pdf.iloc[:half], log_dir, n_files=3)
    q1 = stream_replay(table, log_dir, CHANGELOG_DDL, ckpt, max_files_per_trigger=1)
    q1.awaitTermination(300)
    v_mid = table.current_version()
    # more segments arrive; resume from the SAME checkpoint
    _write_changelog_files(spark, changelog_pdf.iloc[half:], log_dir, n_files=3)
    q2 = stream_replay(table, log_dir, CHANGELOG_DDL, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(300)
    assert table.current_version() > v_mid
    want = _oracle_final(target_pdf, changelog_pdf)
    got = _state(table)
    assert len(got) == len(want)
    assert list(got["text"].fillna("∅")) == list(want["text"].fillna("∅"))
    # exactly-once: lineage has no duplicate (checkpoint, batch) pairs
    lin = table.lineage_df().filter("checkpoint_id like 'stream_%'").toPandas()
    pairs = lin[["checkpoint_id", "batch_id", "snapshot_id"]].drop_duplicates()
    assert not pairs.duplicated(["checkpoint_id", "batch_id"]).any()
