"""Three-way diff (source × target × changelog) vs an oracle composition."""

from __future__ import annotations

import pandas as pd

from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.oracle import OracleStore, oracle_diff
from diffsync_spark.plans.threeway import patch_snapshot, three_way_diff

IDS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "ts"]
ATTRS = ["role", "text", "tool"]


def _oracle_desired(source_pdf, changelog_pdf) -> pd.DataFrame:
    store = OracleStore.from_snapshot(source_pdf, IDS, PAYLOAD)
    store.apply_changelog(changelog_pdf)
    return store.final_df()


def test_patch_snapshot_matches_oracle(spark, source_df, source_pdf,
                                       changelog_df, changelog_pdf):
    got = (
        patch_snapshot(source_df, changelog_df, TRANSCRIPT_MODEL)
        .toPandas()
        .sort_values(IDS)
        .reset_index(drop=True)
    )
    want = _oracle_desired(source_pdf, changelog_pdf).sort_values(IDS).reset_index(
        drop=True
    )
    assert len(got) == len(want)
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    assert list(got["text"].fillna("∅")) == list(want["text"].fillna("∅"))


def test_three_way_diff_matches_oracle(spark, source_df, source_pdf, target_df,
                                       target_pdf, changelog_df, changelog_pdf):
    got = {
        (r.conv_id, r.turn_idx): (r.op, sorted(r.changed_cols or []))
        for r in three_way_diff(
            source_df, target_df, changelog_df, TRANSCRIPT_MODEL
        ).collect()
    }
    desired = _oracle_desired(source_pdf, changelog_pdf)
    want = {
        k: (op, sorted(ch))
        for k, (op, ch) in oracle_diff(desired, target_pdf, IDS, ATTRS).items()
    }
    assert got == want
