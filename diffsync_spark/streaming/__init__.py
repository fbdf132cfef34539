from diffsync_spark.streaming.replay import replay_batches, stream_replay
from diffsync_spark.streaming.windowed import (
    session_change_stats,
    windowed_change_rate,
)

__all__ = [
    "replay_batches",
    "stream_replay",
    "session_change_stats",
    "windowed_change_rate",
]
