"""embedding_neardup at the production operating point (cosine ≥ 0.95):
the query plants deterministic near-identical copies in-flow (testdata is
read-only) and must return exactly those planted pairs — sign-preserving
perturbation guarantees co-bucketing in the IVF cells, so recall of the
planted pairs is 1.0, and no random pair (max cos ≈ 0.51) survives."""

import duckdb

from biomedical_entity_linking_spark.operators.dedup import (
    EMB_NEARDUP_THRESHOLD,
    _PLANT_EVERY,
    _PLANT_ID_OFFSET,
    _finalize_emb_neardup_sql,
    embedding_neardup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_threshold_is_production_operating_point():
    assert EMB_NEARDUP_THRESHOLD >= 0.95


def test_planted_pairs_found_exactly(spark):
    rows = embedding_neardup(spark, SF_DIR).collect()
    n_src = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(f"vec_id % {_PLANT_EVERY} = 0")
        .count()
    )
    assert len(rows) == n_src  # every planted pair found, nothing else
    for r in rows:
        assert r["vec_b"] == r["vec_a"] + _PLANT_ID_OFFSET
        assert r["vec_a"] % _PLANT_EVERY == 0
        assert r["cosine"] >= EMB_NEARDUP_THRESHOLD


def test_oracle_agrees(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.execute(_finalize_emb_neardup_sql()).fetchall()))
    got = sorted(map(tuple, embedding_neardup(spark, SF_DIR).collect()))
    assert got == want
