"""Structured Streaming extension (SURVEY §2.9 / M8)."""
