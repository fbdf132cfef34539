from diffsync_spark.sources.cdc_formats import (
    canal_envelope_schema,
    debezium_envelope_schema,
    from_canal,
    from_debezium,
    from_maxwell,
    from_wal2json,
    maxwell_envelope_schema,
    wal2json_envelope_schema,
)
from diffsync_spark.sources.io import (
    load_from_records,
    read_changelog,
    read_snapshot,
    to_nested_dict,
    diff_str,
    diff_to_json,
)

__all__ = [
    "canal_envelope_schema",
    "debezium_envelope_schema",
    "from_canal",
    "from_debezium",
    "from_maxwell",
    "from_wal2json",
    "maxwell_envelope_schema",
    "wal2json_envelope_schema",
    "load_from_records",
    "read_changelog",
    "read_snapshot",
    "to_nested_dict",
    "diff_str",
    "diff_to_json",
]
