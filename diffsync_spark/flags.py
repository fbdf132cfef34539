"""Diff/sync behavior flags.

Re-expresses the reference's bitmask flags (``/root/reference/diffsync/enum.py:21-87``)
as a plain dataclass: each flag maps to a join mode, a pre-join predicate, or a
MERGE clause toggle instead of a per-object short-circuit
(``/root/reference/diffsync/helpers.py:187-210``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DiffFlags:
    """Options controlling diff classification and apply.

    skip_unmatched_src:
        Drop source-only keys → no ``create`` ops. Reference
        ``SKIP_UNMATCHED_SRC`` (``enum.py:68-72``); implemented as a
        right-outer join instead of full-outer (no post-filter needed).
    skip_unmatched_dst:
        Drop target-only keys → no ``delete`` ops. Reference
        ``SKIP_UNMATCHED_DST`` (``enum.py:74-78``); left-outer join.
    keep_noop:
        Emit ``noop`` rows for matched-and-equal keys. The reference always
        materializes no-change elements in the Diff tree
        (``diff.py:236-254``); apply paths set this False so the diff frame
        only carries actionable rows.
    skip_children_on_delete:
        Parent delete does not cascade into child rows (backend cascades).
        Reference ``SKIP_CHILDREN_ON_DELETE`` (``enum.py:32-36``).
    natural_deletion_order:
        Delete child rows before the parent bookkeeping row. Reference
        ``NATURAL_DELETION_ORDER`` (``enum.py:50-55``). Within one table a
        MERGE commit is atomic, so this only orders multi-table applies.
    continue_on_failure:
        Invalid rows (e.g. null keys, duplicate source keys after LWW) are
        quarantined + counted instead of failing the batch. Reference
        ``CONTINUE_ON_FAILURE`` (``enum.py:65-66``, ``helpers.py:448-454``).
    log_unchanged_records:
        Also log records that have NO changes during a sync (the reference's
        debug-verbosity flag ``LOG_UNCHANGED_RECORDS``, ``enum.py:83-88``).
        Set-based analog: one JSON line per unchanged key (bounded collect —
        a debugging aid by definition, like the reference's off-by-default
        verbosity), plus the exact ``n_noop`` count that always rides the
        merge lineage.
    """

    skip_unmatched_src: bool = False
    skip_unmatched_dst: bool = False
    keep_noop: bool = True
    skip_children_on_delete: bool = False
    natural_deletion_order: bool = False
    continue_on_failure: bool = False
    log_unchanged_records: bool = False

    @property
    def join_how(self) -> str:
        """The diff join type implied by the skip flags — letting the planner
        prune a whole outer side instead of filtering after the join."""
        if self.skip_unmatched_src and self.skip_unmatched_dst:
            return "inner"
        if self.skip_unmatched_src:
            return "right_outer"
        if self.skip_unmatched_dst:
            return "left_outer"
        return "full_outer"
