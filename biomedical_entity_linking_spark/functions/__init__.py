"""Scalar/vector kernel library: string metrics, shingling, MinHash,
deterministic embeddings. All Spark-facing entry points are Arrow-batched
pandas UDFs — no row-at-a-time Python UDFs anywhere (north-rule invariant).
"""
