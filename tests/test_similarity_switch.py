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


def test_proto_topk_routes_to_ivf_above_threshold(spark, tmp_path, monkeypatch):
    """proto_topk must not collect the dictionary above the switch point:
    the two-score sum moves into the IVF cogroup kernel."""
    import biomedical_entity_linking_spark.operators.similarity as S

    monkeypatch.setattr(S, "BRUTE_FORCE_MAX", 50)
    d = _write_embeddings(spark, tmp_path, 120)
    out = S.proto_topk(spark, d, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan  # IVF cogroup kernel
    assert "MapInPandas" not in plan          # broadcast path unreachable
    assert out.count() == 120 * 2


def test_proto_topk_small_uses_broadcast_two_score(spark, tmp_path):
    import biomedical_entity_linking_spark.operators.similarity as S

    d = _write_embeddings(spark, tmp_path, 64, seed=5)
    out = S.proto_topk(spark, d, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapCoGroupsInPandas" not in plan
    assert out.count() == 64 * 2


def _duck_with_embeddings(d, n):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    return con


def test_switched_oracle_parity_ivf_regime(spark, tmp_path, monkeypatch):
    """The oracle mirrors the G8 switch: above the threshold BOTH sides run
    the IVF branch and still hash-match (the latent parity break ADVICE r2
    flagged)."""
    import biomedical_entity_linking_spark.operators.similarity as S

    monkeypatch.setattr(S, "BRUTE_FORCE_MAX", 50)
    d = _write_embeddings(spark, tmp_path, 120, seed=11)
    con = _duck_with_embeddings(d, 120)

    for exact_cte, ivf_proto, fn in [
        (S._BX_RANKED_CTE, False, S.cosine_topk),
        (S._BX_PROTO_RANKED_CTE, True, S.proto_topk),
    ]:
        sql = S._switched_sql(
            exact_cte, S._ix_ranked_cte(proto=ivf_proto), S.TOP_K, switch_at=50
        )
        got = sorted(
            map(tuple, fn(spark, d, k=S.TOP_K).collect())
        )
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want


def test_switched_oracle_parity_exact_regime(spark, tmp_path):
    import biomedical_entity_linking_spark.operators.similarity as S

    d = _write_embeddings(spark, tmp_path, 80, seed=13)
    con = _duck_with_embeddings(d, 80)
    for sql, fn in [
        (S.COSINE_TOPK_SQL, S.cosine_topk),
        (S.PROTO_TOPK_SQL, S.proto_topk),
    ]:
        got = sorted(map(tuple, fn(spark, d, k=S.TOP_K).collect()))
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want


def test_exact_cosine_topk_fails_loudly_above_cap(spark, tmp_path):
    import pytest

    import biomedical_entity_linking_spark.operators.similarity as S

    d = _write_embeddings(spark, tmp_path, 30, seed=17)
    with pytest.raises(ValueError, match="exceeds the broadcast cap"):
        S.exact_cosine_topk(spark, d, fail_above=10).collect()


def test_cached_exact_topk_memoizes(spark, tmp_path):
    import biomedical_entity_linking_spark.operators.similarity as S

    d = _write_embeddings(spark, tmp_path, 40, seed=19)
    a = S.cached_exact_topk(spark, d, k=2)
    b = S.cached_exact_topk(spark, d, k=2)
    assert a is b  # same persisted relation, not a rebuild
    assert a.count() == 40 * 2
