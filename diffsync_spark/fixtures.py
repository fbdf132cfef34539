"""Deterministic synthetic transcript fixtures (FIXTURES.md T1-T4).

Mirrors the reference's fixture strategy — two dense backends differing by a
seeded create/update/delete mix plus one-side-only records
(``/root/reference/tests/unit/conftest.py:230-409``) — translated to the
transcript payload mandated by BASELINE.json. Pure numpy/pandas, seed-stable;
no external data. Conversation lengths are Zipf-skewed so a few hot
conversations exercise skew handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator"])

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
CHANGELOG_COLUMNS = ["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _conv_lengths(n_convs: int, rng: np.random.Generator, max_len: int) -> np.ndarray:
    """Zipf-ish lengths: most conversations 2-20 turns, a few huge."""
    raw = rng.zipf(1.7, size=n_convs)
    return np.clip(raw + 1, 2, max_len).astype(np.int64)


def gen_source(
    n_convs: int = 1000, seed: int = 42, max_len: int = 4000, version: int = 0
) -> pd.DataFrame:
    """T1 — source snapshot. text encodes (conv, turn, version) so per-turn
    text equality is a strong replay check."""
    rng = np.random.default_rng(seed)
    lengths = _conv_lengths(n_convs, rng, max_len)
    conv_idx = np.repeat(np.arange(n_convs), lengths)
    turn_idx = np.concatenate([np.arange(l) for l in lengths]).astype(np.int32)
    n = len(conv_idx)
    role = ROLES[turn_idx % 3]
    tool_mask = (role == "assistant") & (rng.random(n) < 0.2)
    tool = np.where(tool_mask, TOOLS[rng.integers(0, len(TOOLS), n)], None)
    # monotone per conversation: conv base offset + 60s per turn
    ts = BASE_EPOCH + (conv_idx * 86_400_000_000 + turn_idx * 60_000_000).astype(
        "timedelta64[us]"
    )
    text = np.char.add(
        np.char.add(
            np.char.add("c", conv_idx.astype("U10")),
            np.char.add("-t", turn_idx.astype("U10")),
        ),
        f"-v{version}",
    )
    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv_", np.char.zfill(conv_idx.astype("U10"), 6)),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def mutate_target(source: pd.DataFrame, seed: int = 43) -> pd.DataFrame:
    """T2 — destination snapshot derived from T1 by a seeded mutation mix
    (per FIXTURES.md: ~70% identical, ~10% update, ~10% delete-only-in-target,
    ~10% create-only-in-source, plus whole one-sided conversations)."""
    rng = np.random.default_rng(seed)
    df = source.copy()
    n = len(df)
    r = rng.random(n)
    # whole-conversation one-sided cases: first 5 convs only in source
    # (conversation-level create), 5 synthetic convs only in target (delete).
    convs = df["conv_id"].unique()
    src_only_convs = set(convs[:5])
    row_src_only = df["conv_id"].isin(src_only_convs).to_numpy()

    update_mask = (r < 0.10) & ~row_src_only
    drop_from_target = ((r >= 0.10) & (r < 0.20)) | row_src_only  # → create ops
    mutated = df.copy()
    mutated.loc[update_mask, "text"] = mutated.loc[update_mask, "text"] + "-stale"
    flip = update_mask & (rng.random(n) < 0.3)
    mutated.loc[flip, "role"] = "assistant"
    target = mutated[~drop_from_target].copy()

    # target-only rows (→ delete ops): extra turns appended to ~10% convs,
    # plus 5 whole conversations that exist only in the target.
    extra_rows = []
    chosen = rng.choice(convs[5:], size=max(1, len(convs) // 10), replace=False)
    last_turn = df.groupby("conv_id")["turn_idx"].max()
    for cid in chosen:
        t = int(last_turn[cid]) + 1
        extra_rows.append((cid, t, "user", f"{cid}-extra-t{t}", None,
                           df.loc[df.conv_id == cid, "ts"].max() + np.timedelta64(60, "s")))
    for j in range(5):
        cid = f"conv_9z{j:04d}"
        for t in range(3):
            extra_rows.append((cid, t, ROLES[t % 3], f"{cid}-t{t}-v0", None,
                               BASE_EPOCH + np.timedelta64(j * 3600 + t * 60, "s")))
    extra = pd.DataFrame(extra_rows, columns=TRANSCRIPT_COLUMNS)
    extra["turn_idx"] = extra["turn_idx"].astype(np.int32)
    out = pd.concat([target, extra], ignore_index=True)
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def gen_changelog(
    source: pd.DataFrame, n_events: int = 60_000, seed: int = 44
) -> pd.DataFrame:
    """T3 — CDC event stream over the source keyspace with the adversarial
    properties FIXTURES.md lists: in-batch duplicate keys (LWW), exact
    duplicate events (idempotence), late events, hot-key bursts on the
    largest conversations, deletes, and brand-new keys."""
    rng = np.random.default_rng(seed)
    keys = source[["conv_id", "turn_idx"]].to_numpy()
    src_ts = source["ts"].to_numpy()
    n_keys = len(keys)

    # hot bursts: 30% of events target the top-5 largest conversations
    sizes = source.groupby("conv_id").size().sort_values(ascending=False)
    hot_convs = set(sizes.index[:5])
    hot_rows = np.flatnonzero(source["conv_id"].isin(hot_convs).to_numpy())

    pick_hot = rng.random(n_events) < 0.3
    idx = np.where(
        pick_hot,
        hot_rows[rng.integers(0, len(hot_rows), n_events)],
        rng.integers(0, n_keys, n_events),
    )
    op_r = rng.random(n_events)
    op = np.full(n_events, "update", dtype=object)
    op[op_r < 0.10] = "delete"
    op[(op_r >= 0.10) & (op_r < 0.25)] = "insert"

    conv_id = keys[idx, 0].astype(object)
    turn_idx = keys[idx, 1].astype(np.int32)
    # ~5% of inserts go to brand-new keys (turn appended past the end)
    new_key = (op == "insert") & (rng.random(n_events) < 0.33)
    turn_idx = np.where(new_key, turn_idx + 100_000 + rng.integers(0, 50, n_events),
                        turn_idx).astype(np.int32)

    seq = np.arange(n_events, dtype=np.int64)
    # event time: mostly after the source snapshot ts for that key, but ~10%
    # late (earlier than an already-emitted later event) and ~3% ties
    base = src_ts[idx]
    offset = rng.integers(1, 10_000, n_events) * 1_000_000  # 1s..10000s in us
    late = rng.random(n_events) < 0.10
    offset = np.where(late, -rng.integers(1, 5_000, n_events) * 1_000_000, offset)
    ts = base + offset.astype("timedelta64[us]")
    tie = rng.random(n_events) < 0.03
    ts = np.where(tie & (seq > 0), np.roll(ts, 1), ts)

    role = ROLES[rng.integers(0, 3, n_events)].astype(object)
    text = np.char.add(
        np.char.add(conv_id.astype("U16"), np.char.add("-t", turn_idx.astype("U10"))),
        np.char.add("-e", seq.astype("U12")),
    ).astype(object)
    tool = np.where(rng.random(n_events) < 0.1,
                    TOOLS[rng.integers(0, len(TOOLS), n_events)], None)
    deletes = op == "delete"
    role[deletes] = None
    text[deletes] = None
    tool[deletes] = None

    df = pd.DataFrame(
        {
            "seq": seq,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    # exact duplicate events (~2%): re-emit an earlier event verbatim with the
    # SAME seq (simulating at-least-once redelivery)
    dup_take = df.sample(frac=0.02, random_state=seed).copy()
    out = pd.concat([df, dup_take], ignore_index=True)
    # keep a deterministic arrival order: duplicates arrive right after the
    # original stream, then sort by (seq, arrival) is stable
    return out.reset_index(drop=True)


def evolve(df: pd.DataFrame, seed: int = 45) -> pd.DataFrame:
    """T4 — schema-evolution variant: add nullable ``tool_call_id``
    (the "new tool field" of BASELINE.json)."""
    rng = np.random.default_rng(seed)
    out = df.copy()
    has_tool = out["tool"].notna().to_numpy()
    ids = np.array([f"call_{i:08d}" for i in range(len(out))], dtype=object)
    out["tool_call_id"] = np.where(has_tool, ids, None)
    return out


# --------------------------------------------------------------------------
# Spark-side distributed generators (bench scale). The pandas generators
# above stay the differential-test fixtures; these produce arbitrarily large
# deterministic inputs without ever materializing rows on the driver —
# everything is column expressions over spark.range(), so a 10^8-event
# changelog generates in parallel across executors.
# --------------------------------------------------------------------------

def gen_source_spark(spark, n_convs: int = 100_000, turns_per_conv: int = 20,
                     text_bytes: int = 256):
    """Deterministic snapshot: n_convs × turns_per_conv keyed rows with
    realistic transcript-sized text payloads."""
    from pyspark.sql import functions as F

    n = n_convs * turns_per_conv
    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    reps = max(1, text_bytes // len(filler))
    df = spark.range(n).select(
        F.concat(
            F.lit("conv_"),
            F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 8, "0"),
        ).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        F.concat(
            F.lit("v0-"), F.col("id").cast("string"), F.lit("-"),
            F.lit(filler * reps),
        ).alias("text"),
        F.when(F.pmod(F.xxhash64("id"), F.lit(5)) == 0, F.lit("search"))
        .alias("tool"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("id") / turns_per_conv).cast("long")
                              * 3600 + F.pmod(F.col("id"), F.lit(turns_per_conv))
                              * 60)
        ).alias("ts"),
    )
    return df


def gen_changelog_spark(spark, n_events: int, n_convs: int = 100_000,
                        turns_per_conv: int = 20, text_bytes: int = 256,
                        hot_fraction: float = 0.3, seed: int = 7):
    """Deterministic CDC stream over the gen_source_spark keyspace: ~10%
    deletes, duplicate keys, late events, and a hot-key skew (hot_fraction of
    events target 5 conversations) — all as column expressions."""
    from pyspark.sql import functions as F

    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    reps = max(1, text_bytes // len(filler))
    h = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_000))  # noqa: E731
    is_hot = h(0) < int(hot_fraction * 1_000_000)
    conv_idx = F.when(is_hot, F.pmod(h(1), F.lit(5))).otherwise(
        F.pmod(h(2), F.lit(n_convs))
    )
    turn_idx = F.pmod(h(3), F.lit(turns_per_conv + 5))  # some brand-new keys
    is_delete = h(4) < 100_000  # 10%
    is_late = h(5) < 100_000
    df = spark.range(n_events).select(
        F.col("id").alias("seq"),
        F.when(is_delete, F.lit("delete")).otherwise(F.lit("update")).alias("op"),
        F.concat(F.lit("conv_"), F.lpad(conv_idx.cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        turn_idx.cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(h(6), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        F.when(
            ~is_delete,
            F.concat(F.lit("e"), F.col("id").cast("string"), F.lit("-"),
                     F.lit(filler * reps)),
        ).alias("text"),
        F.when(F.pmod(h(7), F.lit(10)) == 0, F.lit("python")).alias("tool"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(
                secs=conv_idx * 3600
                + F.when(is_late, -(F.pmod(h(8), F.lit(5000)) + 1))
                .otherwise(F.pmod(h(9), F.lit(100_000)) + 61)
            )
        ).alias("ts"),
    )
    return df
