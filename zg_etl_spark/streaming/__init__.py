from zg_etl_spark.streaming.engine import (
    MappingStore,
    incremental_device_ids,
    start_event_counts_stream,
    start_identity_stream,
)

__all__ = [
    "MappingStore",
    "incremental_device_ids",
    "start_event_counts_stream",
    "start_identity_stream",
]
