from privacy_cdc_lakehouse_spark.streaming.pipeline import (
    run_stream_to_silver,
    streaming_window_counts,
    watermarked_dedup,
)

__all__ = ["run_stream_to_silver", "streaming_window_counts", "watermarked_dedup"]
