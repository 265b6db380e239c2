"""Structured Streaming layer: sources, medallion pipeline, sinks, state."""
