from .pipeline import (
    file_pings_stream,
    file_points_stream,
    file_sessions_stream,
    make_epoch_batch_writer,
    stream_encode_sink,
    stream_geofence_transitions,
    stream_running_tile_totals,
    stream_tile_counts,
    stream_user_sessions,
)

__all__ = [
    "file_pings_stream",
    "file_points_stream",
    "stream_tile_counts",
    "stream_encode_sink",
    "make_epoch_batch_writer",
    "stream_running_tile_totals",
    "stream_geofence_transitions",
    "file_sessions_stream",
    "stream_user_sessions",
]
