"""Structured Streaming wrappers over the incremental engine (SURVEY §2.7)."""
