"""Relational completeness suite over the TPC-H-ish tables (stub — filled next)."""
