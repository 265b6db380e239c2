"""Text-analysis queries over documents (stub — filled next)."""
