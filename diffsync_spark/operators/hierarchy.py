"""Two-table (parent → child) synchronized apply with deletion ordering and
per-model flag overrides.

The reference nests children inside parents (``_children`` uid lists,
``/root/reference/diffsync/__init__.py:104-110``) and walks the tree; the
Spark rendering keeps each level in its own table FK'd by the parent's
identifiers (SURVEY §1.1), so a hierarchy sync is an ORDERED sequence of
set-based merges:

1. parent creates/updates   (FK target exists before children arrive)
2. child  creates/updates
3. child  deletes           — before the parent bookkeeping when
                              ``natural_deletion_order`` is set (reference
                              ``NATURAL_DELETION_ORDER``, ``enum.py:50-55``,
                              ``helpers.py:367-378``); after it otherwise
                              (the reference's legacy order)
4. cascade: children of deleted parents are tombstoned unless the child
   model's flags set ``skip_children_on_delete`` (reference model flag
   ``SKIP_CHILDREN_ON_DELETE``, ``enum.py:32-36``)
5. parent deletes

Per-model flag overrides are the reference's ``DiffSyncModelFlags``
(``enum.py:38-48``) analog: pass ``flags={"conversation": DiffFlags(...),
"turn": DiffFlags(...)}`` so e.g. the parent table skips unmatched targets
while the child table deletes them.

Each step is its own exactly-once commit (checkpoint id = step name); a crash
mid-sequence resumes at the first uncommitted step on re-run with the same
``batch_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from diffsync_spark.engine import Engine
from diffsync_spark.flags import DiffFlags


class HierarchySync:
    """Orchestrates a parent table + child table as one logical sync."""

    def __init__(
        self,
        parent: Engine,
        child: Engine,
        flags: DiffFlags | dict[str, DiffFlags] | None = None,
    ):
        if set(parent.model.identifiers) != set(child.model.parent_key):
            raise ValueError(
                f"child parent_key {child.model.parent_key} must equal parent "
                f"identifiers {parent.model.identifiers}"
            )
        self.parent = parent
        self.child = child
        if flags is None:
            flags = DiffFlags()
        if isinstance(flags, DiffFlags):
            flags = {parent.model.name: flags, child.model.name: flags}
        self.flags = {
            parent.model.name: flags.get(parent.model.name, DiffFlags()),
            child.model.name: flags.get(child.model.name, DiffFlags()),
        }

    def sync_from(
        self,
        parent_src: DataFrame,
        child_src: DataFrame,
        batch_id: int | None = None,
    ) -> list[tuple[str, dict]]:
        """Bring both tables to the sources' state; returns the ordered
        (step, merge-result) list so callers/tests can audit commit order."""
        pflags, cflags = (self.flags[self.parent.model.name],
                          self.flags[self.child.model.name])
        p_diff = self.parent.diff_from(parent_src, pflags)
        c_diff = self.child.diff_from(child_src, cflags)

        steps: list[tuple[str, dict]] = []

        def apply(step: str, engine: Engine, d: DataFrame, ops: tuple[str, ...]):
            part = d.filter(F.col("op").isin(*ops))
            res = engine.table.apply_diff(part, checkpoint_id=f"hier_{step}",
                                          batch_id=batch_id)
            steps.append((step, res))

        apply("parent_upsert", self.parent, p_diff, ("create", "update"))
        apply("child_upsert", self.child, c_diff, ("create", "update"))
        if cflags.natural_deletion_order or pflags.natural_deletion_order:
            apply("child_delete", self.child, c_diff, ("delete",))
            self._cascade(p_diff, batch_id, steps)
            apply("parent_delete", self.parent, p_diff, ("delete",))
        else:
            apply("parent_delete", self.parent, p_diff, ("delete",))
            self._cascade(p_diff, batch_id, steps)
            apply("child_delete", self.child, c_diff, ("delete",))
        return steps

    def _cascade(self, p_diff: DataFrame, batch_id: int | None,
                 steps: list[tuple[str, dict]]) -> None:
        """Tombstone child rows whose parent is being deleted — set-based
        (semi-join against the delete keys, never a collected key list)."""
        if self.flags[self.child.model.name].skip_children_on_delete:
            return
        fk = list(self.child.model.parent_key)
        dead_parents = p_diff.filter(F.col("op") == "delete").select(*fk)
        ids = list(self.child.model.identifiers)
        victims = self.child.read().join(dead_parents, fk, "semi")
        batch = victims.select(
            *ids,
            F.lit("delete").alias("op"),
            *[F.col(c) for c in victims.columns if c not in ids],
        )
        res = self.child.table.merge(
            batch, checkpoint_id="hier_cascade", batch_id=batch_id,
            mode="force",
        )
        steps.append(("cascade_children", res))

    def converged(self, parent_src: DataFrame, child_src: DataFrame) -> bool:
        return (
            self.parent.converged(parent_src)
            and self.child.converged(child_src)
        )
