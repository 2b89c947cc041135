from .sessions import stream_sessionize, stream_windowed_counts

__all__ = ["stream_sessionize", "stream_windowed_counts"]
