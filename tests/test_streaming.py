"""Structured Streaming tests: the real readStream pipeline completes
under availableNow and matches the batch twin."""

from __future__ import annotations

from chiv_spark.queries.base import t as read_t
from chiv_spark.streaming.events import run_events_stream, windowed_event_counts


class TestEventsStream:
    def test_stream_matches_batch(self, spark, sf_dir, tmp_path):
        streamed = run_events_stream(spark, sf_dir, str(tmp_path / "ckpt"))
        batch = windowed_event_counts(read_t(spark, sf_dir, "events"))
        srows = {tuple(r) for r in streamed.collect()}
        brows = {tuple(r) for r in batch.collect()}
        assert srows == brows
        assert len(srows) > 0

    def test_watermark_present_in_stream_plan(self, spark, sf_dir):
        agg = windowed_event_counts(read_t(spark, sf_dir, "events"))
        assert "window_start" in agg.columns
