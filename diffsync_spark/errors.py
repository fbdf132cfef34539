"""Engine exceptions.

Mirrors the reference's exception surface (``/root/reference/diffsync/exceptions.py:25-67``)
where a config/contract violation is a Python exception; *data-level* failures
(the reference's ObjectNotCreated/Updated/Deleted under CONTINUE_ON_FAILURE,
``helpers.py:448-454``) become quarantined rows + metrics instead, because at
10^10 events a per-record exception is not a control-flow primitive.
"""


class DiffSyncSparkError(Exception):
    """Base class for engine errors."""


class SchemaDeclarationError(DiffSyncSparkError):
    """Invalid ModelSchema declaration (missing fields, overlapping groupings).

    Mirrors the class-definition-time validation at
    ``/root/reference/diffsync/__init__.py:130-159``.
    """


class ObjectNotFound(DiffSyncSparkError):
    """Point lookup missed (``/root/reference/diffsync/exceptions.py``: ObjectNotFound)."""


class ObjectAlreadyExists(DiffSyncSparkError):
    """Insert conflicted with an existing, different record
    (``/root/reference/diffsync/store/local.py:91-113``)."""


class DiffClassMismatch(DiffSyncSparkError):
    """A precomputed diff was built with a different configuration than the
    sync that consumes it (``/root/reference/diffsync/__init__.py:600-604``)."""


class CommitConflict(DiffSyncSparkError):
    """Concurrent snapshot commit detected on the target table."""
