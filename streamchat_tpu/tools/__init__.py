"""Benchmark curation tools (reference L6, `tools/`)."""
