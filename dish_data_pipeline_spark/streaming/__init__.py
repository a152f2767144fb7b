from dish_data_pipeline_spark.streaming.pipeline import (
    stream_dedup_exact,
    stream_incremental_neardup,
    stream_raw_zone,
    stream_upsert_to_target,
    windowed_event_counts,
)

__all__ = [
    "stream_dedup_exact",
    "stream_incremental_neardup",
    "stream_raw_zone",
    "stream_upsert_to_target",
    "windowed_event_counts",
]
