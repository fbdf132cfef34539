from __future__ import annotations

import pytest

from diffsync_spark import lww_dedup
from diffsync_spark.errors import ObjectNotFound
from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.operators import store_ops


def test_lww_picks_max_ts_seq(spark, changelog_df, changelog_pdf):
    deduped = lww_dedup(changelog_df, TRANSCRIPT_MODEL).toPandas()
    # unique per key
    assert not deduped.duplicated(["conv_id", "turn_idx"]).any()
    # winner per key == pandas argmax on (ts, seq)
    want = (
        changelog_pdf.sort_values(["ts", "seq"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    got = deduped.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["seq"].values == want["seq"].values).all()
    assert (got["ts"].values == want["ts"].values).all()


def test_get_and_get_or_none(spark, source_df, source_pdf):
    first = source_pdf.iloc[0]
    rec = store_ops.get(source_df, TRANSCRIPT_MODEL, (first.conv_id, int(first.turn_idx)))
    assert rec["text"] == first.text
    assert store_ops.get_or_none(source_df, TRANSCRIPT_MODEL, ("nope", 0)) is None
    with pytest.raises(ObjectNotFound):
        store_ops.get(source_df, TRANSCRIPT_MODEL, ("nope", 0))


def test_get_by_uids_order_and_missing(spark, source_df, source_pdf):
    ks = [
        (source_pdf.iloc[5].conv_id, int(source_pdf.iloc[5].turn_idx)),
        (source_pdf.iloc[0].conv_id, int(source_pdf.iloc[0].turn_idx)),
    ]
    got = store_ops.get_by_uids(source_df, TRANSCRIPT_MODEL, ks).collect()
    assert [(r.conv_id, r.turn_idx) for r in got] == ks  # request order preserved
    with pytest.raises(ObjectNotFound):
        store_ops.get_by_uids(source_df, TRANSCRIPT_MODEL, ks + [("nope", 1)])


def test_count(source_df, source_pdf):
    assert store_ops.count(source_df) == len(source_pdf)
