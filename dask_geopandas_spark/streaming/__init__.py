"""Structured Streaming operators (beyond-reference; SURVEY §2.9):
windowed/session/sliding rollups and geofencing (geo.py), streaming
dedup (dedup.py), and the stream-stream funnel joins incl. the N-step
chained form (joins.py)."""

from .joins import (event_sequence_join, funnel_join,  # noqa: F401
                    state_partitions)
