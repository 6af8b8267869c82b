"""G8 size-based exact-vs-IVF strategy switch (reference
``data_process.py:545-562``: IndexFlatIP ≤10k rows, else IndexIVFFlat)."""

import numpy as np

from biomedical_entity_linking_spark.operators.similarity import (
    BRUTE_FORCE_MAX,
    cosine_topk,
    ivf_topk,
)


def _write_embeddings(spark, tmp_path, n, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    rows = [
        (i, [float(x) for x in rng.standard_normal(dim)], i % 5)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / f"sf_{n}")
    df.coalesce(4).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_small_dictionary_uses_broadcast_matmul(spark, tmp_path):
    d = _write_embeddings(spark, tmp_path, 64)
    out = cosine_topk(spark, d, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # broadcast brute-force kernel
    assert "FlatMapCoGroupsInPandas" not in plan
    assert out.count() == 64 * 2


def test_large_dictionary_routes_to_ivf(spark, tmp_path, monkeypatch):
    """Above the threshold the driver-collect path must be unreachable."""
    import biomedical_entity_linking_spark.operators.similarity as S

    # lower the switch point so the test stays fast; semantics unchanged
    monkeypatch.setattr(S, "BRUTE_FORCE_MAX", 50)
    d = _write_embeddings(spark, tmp_path, 120)
    out = S.cosine_topk(spark, d, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan  # IVF cogroup kernel
    assert out.count() == 120 * 2


def test_ivf_recall_vs_exact(spark, tmp_path):
    """Multi-probe IVF top-1 agrees with exact top-1 for the vast majority
    of queries (sign-bit cells + Hamming-1 probes)."""
    d = _write_embeddings(spark, tmp_path, 300)
    exact = {
        r["vec_id"]: r["neighbor_id"]
        for r in cosine_topk(spark, d, k=1).collect()
    }
    approx = {
        r["vec_id"]: r["neighbor_id"]
        for r in ivf_topk(spark, d, k=1).collect()
    }
    agree = sum(1 for v, n in exact.items() if approx.get(v) == n)
    assert agree / len(exact) >= 0.6  # random vectors: hard regime for ANN
