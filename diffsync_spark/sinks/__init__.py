from diffsync_spark.sinks.table import SnapshotTable

__all__ = ["SnapshotTable"]
