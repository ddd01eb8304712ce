from .windows import run_to_memory, session_windows, stream_events, tumbling_counts

__all__ = ["stream_events", "tumbling_counts", "session_windows", "run_to_memory"]
