from diffsync_spark.streaming.replay import replay_batches, stream_replay

__all__ = ["replay_batches", "stream_replay"]
