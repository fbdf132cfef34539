from diffsync_spark.streaming.replay import (
    pipe_aggregate,
    pipe_changes,
    replay_batches,
    stream_changes,
    stream_replay,
)
from diffsync_spark.streaming.windowed import (
    session_change_stats,
    windowed_change_rate,
)

__all__ = [
    "pipe_aggregate",
    "pipe_changes",
    "replay_batches",
    "stream_changes",
    "stream_replay",
    "session_change_stats",
    "windowed_change_rate",
]
