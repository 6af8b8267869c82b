"""Distributed operators: blocking, pair generation, scoring, connected
components, cluster readoff, dedup family, similarity search."""
