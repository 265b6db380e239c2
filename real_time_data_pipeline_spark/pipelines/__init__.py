"""End-to-end pipeline assemblies built from the generic operators."""
