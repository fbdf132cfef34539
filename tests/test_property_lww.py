"""Property-based differential testing: random CDC streams, random batch
splits — the Spark engine's final state must equal the pure-Python
reference-semantics oracle, for ANY input and ANY batching.

Complements the fixed-seed differential tests: hypothesis explores the edge
space (duplicate (ts, seq) versions, null-ts deletes, create-after-delete,
single-key hot streams, empty batches)."""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from diffsync_spark.model import TRANSCRIPT_MODEL
from diffsync_spark.oracle import OracleStore
from diffsync_spark.sinks.table import SnapshotTable

IDS = ["conv_id", "turn_idx"]
PAYLOAD = ["role", "text", "tool", "ts"]
BASE_TS = datetime.datetime(2025, 1, 1)

# small key space on purpose: collisions, re-deletes and re-creates are the
# interesting cases
_events = st.lists(
    st.tuples(
        st.integers(0, 3),                    # conv
        st.integers(0, 2),                    # turn
        st.sampled_from(["update", "delete", "insert"]),
        st.one_of(st.none(), st.integers(0, 5)),  # ts offset hours (None → null ts)
        st.text(alphabet="abc", max_size=3),  # payload text
    ),
    min_size=1,
    max_size=25,
)


def _frame(events) -> pd.DataFrame:
    rows = []
    for seq, (conv, turn, op, ts_off, text) in enumerate(events):
        if op != "delete" and ts_off is None:
            ts_off = 0  # merge quarantines null-ts upserts; keep them valid
        rows.append({
            "seq": seq,
            "op": op,
            "conv_id": f"c{conv}",
            "turn_idx": turn,
            "role": "user",
            "text": text,
            "tool": None,
            "ts": None if ts_off is None else BASE_TS + datetime.timedelta(hours=ts_off),
        })
    return pd.DataFrame(rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=_events, n_batches=st.integers(1, 4))
def test_random_stream_matches_oracle(spark, tmp_path_factory, events, n_batches):
    pdf = _frame(events)
    tmp = tmp_path_factory.mktemp("prop")
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    empty = spark.createDataFrame([], schema)
    table = SnapshotTable.create(spark, str(tmp / "t"), TRANSCRIPT_MODEL,
                                 schema=empty.schema, n_buckets=2)
    chg_schema = "seq long, op string, " + schema
    span = (len(pdf) + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = pdf.iloc[i * span:(i + 1) * span]
        if len(part) == 0:
            continue
        batch = spark.createDataFrame(part, chg_schema)
        table.merge(batch, checkpoint_id="prop", batch_id=i, mode="lww")

    store = OracleStore.from_snapshot(
        pd.DataFrame(columns=["conv_id", "turn_idx", *PAYLOAD]).astype(
            {"turn_idx": "int64"}), IDS, PAYLOAD)
    store.versions.clear()  # empty snapshot → no preexisting versions
    store.apply_changelog(pdf)
    want = store.final_df().sort_values(IDS).reset_index(drop=True)

    got = table.read().orderBy(*IDS).toPandas().reset_index(drop=True)
    assert len(got) == len(want), f"{len(got)} rows != oracle {len(want)}"
    if len(want):
        assert list(got["conv_id"]) == list(want["conv_id"])
        assert list(got["turn_idx"]) == list(want["turn_idx"])
        gt = got["text"].where(got["text"].notna(), None)
        wt = want["text"].where(want["text"].notna(), None)
        assert list(gt) == list(wt)
