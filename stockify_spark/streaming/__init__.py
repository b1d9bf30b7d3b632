from stockify_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_agg,
    stream_events,
    dedup_within_watermark,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_agg",
    "stream_events",
    "dedup_within_watermark",
]
