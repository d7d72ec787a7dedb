"""Structured Streaming surface: windowed aggregation, sessionization."""
