from diffsync_spark.sources.io import (
    load_from_records,
    read_changelog,
    read_snapshot,
    to_nested_dict,
    diff_str,
    diff_to_json,
)

__all__ = [
    "load_from_records",
    "read_changelog",
    "read_snapshot",
    "to_nested_dict",
    "diff_str",
    "diff_to_json",
]
