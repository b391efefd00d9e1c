from .ingest import (  # noqa: F401
    stream_anchor_counts,
    stream_pages,
    windowed_mention_volume,
)
