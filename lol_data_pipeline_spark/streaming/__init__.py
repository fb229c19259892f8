"""Structured Streaming operators (windows, watermarks, sessions)."""
