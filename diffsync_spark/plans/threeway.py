"""Three-way diff: source snapshot × target table × changelog.

The reference diffs exactly two fully-loaded snapshots
(``/root/reference/diffsync/helpers.py:69-138``); the CDC generalization
(BASELINE.json north_star) adds the change log as a third input: the *desired*
state is the source snapshot patched with every changelog event that is newer
than the snapshot row (LWW by ``(ts, seq)``), and the diff is then desired vs
target — two chained full-outer joins on the same natural key, which Spark
executes as one pipeline (the second join reuses the first's hash
partitioning, so only the changelog side shuffles twice at worst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diffsync_spark.flags import DiffFlags
from diffsync_spark.model import ModelSchema
from diffsync_spark.operators.diff import diff
from diffsync_spark.operators.lww import lww_dedup

SNAPSHOT_SEQ = -1  # snapshot rows sort below any changelog event at equal ts


def patch_snapshot(
    source: DataFrame, changelog: DataFrame, model: ModelSchema
) -> DataFrame:
    """Apply a changelog on top of a snapshot, producing the desired state.

    An event beats the snapshot row for its key iff ``(ts, seq)`` >
    ``(row.ts, -1)`` lexicographically (same rule the sink's LWW merge and the
    oracle use, so all three agree). Winning deletes remove the key; losing
    (late) events leave the snapshot row in place.
    """
    if not model.version_cols:
        raise ValueError("patch_snapshot requires model.version_cols")
    ts = model.version_cols[0]
    ids = list(model.identifiers)
    latest = lww_dedup(changelog, model)

    payload = [c for c in source.columns if c not in ids]
    ev_payload = [
        c for c in latest.columns if c not in ids and c not in ("op", "seq")
    ]
    all_payload = payload + [c for c in ev_payload if c not in payload]

    s = source.withColumn("__s_here", F.lit(True)).alias("s")
    e = latest.withColumn("__e_here", F.lit(True)).alias("e")
    # plain equality: non-null keys by contract (see operators/diff.py); the
    # LWW window and this join then share one hash partitioning, so the
    # changelog side shuffles once, not twice
    cond = None
    for k in ids:
        eq = F.col(f"s.{k}") == F.col(f"e.{k}")
        cond = eq if cond is None else cond & eq
    j = s.join(e, cond, "full_outer")

    s_here = F.col("s.__s_here").isNotNull()
    e_here = F.col("e.__e_here").isNotNull()
    ev_newer = (F.col(f"e.{ts}") > F.col(f"s.{ts}")) | (
        F.col(f"e.{ts}").eqNullSafe(F.col(f"s.{ts}"))
        & (F.col("e.seq") > F.lit(SNAPSHOT_SEQ))
    )
    ev_wins = e_here & (~s_here | ev_newer | F.col(f"e.{ts}").isNull())
    is_delete = F.lower(F.col("e.op")) == "delete"

    def pick(c: str):
        e_side = F.col(f"e.{c}") if c in ev_payload else F.lit(None)
        s_side = F.col(f"s.{c}") if c in payload else F.lit(None)
        return F.when(ev_wins, e_side).otherwise(s_side).alias(c)

    out = j.select(
        *[F.coalesce(F.col(f"s.{k}"), F.col(f"e.{k}")).alias(k) for k in ids],
        *[pick(c) for c in all_payload],
        (ev_wins & is_delete).alias("__dropped"),
    )
    return out.filter(~F.col("__dropped")).drop("__dropped")


def three_way_diff(
    source: DataFrame,
    target: DataFrame,
    changelog: DataFrame,
    model: ModelSchema,
    flags: DiffFlags = DiffFlags(),
) -> DataFrame:
    """diff(patch(source, changelog), target) — the ops that bring the target
    to the changelog-adjusted desired state."""
    return diff(patch_snapshot(source, changelog, model), target, model, flags)
