"""Structured Streaming face of the extraction engine."""
