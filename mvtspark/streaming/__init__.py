from .pipeline import (
    file_pings_stream,
    file_points_stream,
    file_sessions_stream,
    make_counts_maintenance_writer,
    make_epoch_batch_writer,
    read_tile_counts,
    stream_encode_sink,
    stream_geofence_transitions,
    stream_tile_counts_maintenance,
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
    "make_counts_maintenance_writer",
    "read_tile_counts",
    "stream_tile_counts_maintenance",
    "stream_running_tile_totals",
    "stream_geofence_transitions",
    "file_sessions_stream",
    "stream_user_sessions",
]
