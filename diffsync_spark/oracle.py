"""Pure-Python oracle implementing the reference semantics for differential tests.

Shape mirrors the reference's keyed store + differ + syncer
(``/root/reference/diffsync/store/local.py:20`` dict store,
``diffsync/helpers.py:102-234`` full-outer pair diff,
``diffsync/helpers.py:322-458`` ordered apply), extended with the CDC rules
our engine adds (LWW by ``(ts, seq)``, tombstones, schema evolution). It is
deliberately slow and obvious — dicts and loops — so the Spark engine can be
checked against an independent implementation. Never used at scale.
"""

from __future__ import annotations

from typing import Any, Hashable

import pandas as pd

Key = tuple[Hashable, ...]

MIN_VERSION = (pd.Timestamp.min.to_datetime64(), -1)


def _records(df: pd.DataFrame, id_cols: list[str]) -> dict[Key, dict[str, Any]]:
    recs: dict[Key, dict[str, Any]] = {}
    for row in df.to_dict("records"):
        key = tuple(row[c] for c in id_cols)
        recs[key] = row
    return recs


def _is_na(v: Any) -> bool:
    return v is None or (isinstance(v, float) and v != v) or v is pd.NaT


def _eq(a: Any, b: Any) -> bool:
    if _is_na(a) and _is_na(b):
        return True
    if _is_na(a) or _is_na(b):
        return False
    return a == b


def oracle_diff(
    source: pd.DataFrame,
    target: pd.DataFrame,
    id_cols: list[str],
    attr_cols: list[str],
    skip_unmatched_src: bool = False,
    skip_unmatched_dst: bool = False,
) -> dict[Key, tuple[str, list[str]]]:
    """Classify every key into create/update/delete/noop with changed attrs.

    Attribute comparison uses the intersection of attrs present on both
    frames (reference ``diff.py:266-279``).
    """
    shared = [c for c in attr_cols if c in source.columns and c in target.columns]
    src = _records(source, id_cols)
    dst = _records(target, id_cols)
    out: dict[Key, tuple[str, list[str]]] = {}
    for key in sorted(set(src) | set(dst), key=lambda k: tuple(map(str, k))):
        in_s, in_d = key in src, key in dst
        if in_s and not in_d:
            if not skip_unmatched_src:
                out[key] = ("create", [])
        elif in_d and not in_s:
            if not skip_unmatched_dst:
                out[key] = ("delete", [])
        else:
            changed = [c for c in shared if not _eq(src[key].get(c), dst[key].get(c))]
            out[key] = ("update", changed) if changed else ("noop", [])
    return out


class OracleStore:
    """Reference-semantics keyed store with LWW + tombstones.

    Versions are ``(ts, seq)`` tuples compared lexicographically; an incoming
    change applies iff its version is strictly greater than the stored one
    (so replaying any prefix/suffix of the stream, in any batching, converges
    to the same state — the idempotence/exactly-once invariant).
    Snapshot rows load with ``seq = -1`` so any changelog event at the same
    ``ts`` wins.
    """

    def __init__(self, id_cols: list[str], payload_cols: list[str]):
        self.id_cols = list(id_cols)
        self.payload_cols = list(payload_cols)
        self.rows: dict[Key, dict[str, Any]] = {}
        self.versions: dict[Key, tuple] = {}
        self.deleted: dict[Key, bool] = {}

    @classmethod
    def from_snapshot(
        cls, df: pd.DataFrame, id_cols: list[str], payload_cols: list[str]
    ) -> "OracleStore":
        store = cls(id_cols, payload_cols)
        for row in df.to_dict("records"):
            key = tuple(row[c] for c in id_cols)
            store.rows[key] = {c: row.get(c) for c in store.payload_cols}
            store.versions[key] = (row["ts"], -1)
            store.deleted[key] = False
        return store

    def apply_event(self, row: dict[str, Any]) -> None:
        key = tuple(row[c] for c in self.id_cols)
        ts = row["ts"]
        if row["op"] == "delete" and _is_na(ts):
            # null-ts delete = always-newest permanent tombstone, matching
            # SnapshotTable.merge and lww_dedup (desc_nulls_first)
            ts = pd.Timestamp.max
        version = (ts, row["seq"])
        if key in self.versions and version <= self.versions[key]:
            return  # older writer (or exact duplicate) loses
        self.versions[key] = version
        if row["op"] == "delete":
            self.deleted[key] = True
            return
        self.deleted[key] = False
        payload = {c: row.get(c) for c in self.payload_cols}
        # schema evolution: a new column appears mid-stream
        for c in row:
            if c not in ("op", "seq") and c not in self.id_cols and c not in self.payload_cols:
                self.payload_cols.append(c)
                payload[c] = row.get(c)
        self.rows[key] = payload

    def apply_changelog(self, changelog: pd.DataFrame) -> None:
        ordered = changelog.sort_values("seq", kind="stable")
        for row in ordered.to_dict("records"):
            self.apply_event(row)

    def final_df(self) -> pd.DataFrame:
        """Live (non-tombstoned) rows, sorted by key — the T5 oracle output."""
        recs = []
        for key in sorted(self.rows, key=lambda k: tuple(map(str, k))):
            if self.deleted.get(key):
                continue
            rec = dict(zip(self.id_cols, key))
            rec.update({c: self.rows[key].get(c) for c in self.payload_cols})
            recs.append(rec)
        return pd.DataFrame(recs, columns=self.id_cols + self.payload_cols)
