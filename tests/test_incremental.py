"""incremental_linkage: oracle parity lives in test_oracle_parity /
the driver; here the SEMANTIC invariants and a planted end-to-end case."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import incremental as IC

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def out(spark):
    return IC.incremental_linkage(spark, SF).toPandas()


def test_every_delta_row_exactly_once(spark, out):
    delta_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .collect()
    )
    assert sorted(out.doc_id) == delta_ids
    assert out.doc_id.is_unique


def test_assignment_invariants(out):
    matched = out[~out.is_new]
    new = out[out.is_new]
    # matched rows point at a BASE cluster (base ids are never %10==0)
    assert (matched.cluster_id % 10 != 0).all()
    assert (matched.match_dist <= IC.MAX_DIST).all()
    assert (matched.match_dist >= 0).all()
    # new rows self-cluster and carry no distance
    assert (new.cluster_id == new.doc_id).all()
    assert new.match_dist.isna().all()


def test_exact_dup_delta_joins_its_base_cluster(spark, out):
    """Any delta doc whose normalized prefix equals a base doc's must be
    assigned (dist 0) to that base cluster's canonical min id."""
    docs = IC._normed(spark, SF).toPandas()
    base = docs[docs.doc_id % 10 != 0]
    delta = docs[docs.doc_id % 10 == 0]
    canon = base.groupby("norm").doc_id.min()
    exact = delta[delta.norm.isin(set(base.norm))]
    assert len(exact) > 0, "fixture must contain cross-split exact dups"
    got = out.set_index("doc_id")
    for _, row in exact.iterrows():
        r = got.loc[row.doc_id]
        assert r.match_dist == 0
        assert r.cluster_id == canon[row.norm]
        assert not r.is_new


def test_base_never_rescored(spark):
    """The base relation reaches the join only as one row per cluster —
    the plan's join inputs must aggregate base BEFORE joining (the
    incremental contract: O(|delta| x block), base never pairs with
    itself)."""
    import contextlib
    import io

    df = IC.incremental_linkage(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the canonical groupBy (min doc_id per norm) must sit below the join
    join_pos = plan.find("Join")
    agg_pos = plan.find("HashAggregate")
    assert agg_pos != -1 and join_pos != -1
