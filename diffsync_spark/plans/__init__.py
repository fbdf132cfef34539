from diffsync_spark.plans.threeway import patch_snapshot, three_way_diff

__all__ = ["patch_snapshot", "three_way_diff"]
