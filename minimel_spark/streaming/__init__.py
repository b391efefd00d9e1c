from .ingest import (  # noqa: F401
    stream_anchor_counts,
    stream_events,
    stream_hourly_event_stats,
    stream_pages,
    stream_sessionize,
    windowed_mention_volume,
)
