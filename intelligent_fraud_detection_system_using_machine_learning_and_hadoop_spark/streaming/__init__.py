from .jobs import read_events_stream, stream_events_hourly, stream_score_claims

__all__ = ["read_events_stream", "stream_events_hourly", "stream_score_claims"]
