"""Structured Streaming surface of the engine."""

from etl_tj_project_spark.streaming.daily_stream import (  # noqa: F401
    windowed_event_agg,
    windowed_event_agg_stream,
)
