"""Structured Streaming: incremental index maintenance."""
