from chiv_spark.streaming.events import run_events_stream, windowed_event_counts

__all__ = ["run_events_stream", "windowed_event_counts"]
