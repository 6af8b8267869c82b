"""Deterministic synchronous LPA: planted community structure, tie and
isolation semantics, and cross-engine parity at sf0.001."""

import duckdb

from biomedical_entity_linking_spark.operators import linkgraph as LG


def _run(spark, nodes, und_edges):
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    und_df = spark.createDataFrame(und_edges, "u long, v long")
    out = LG._lpa(nodes_df, und_df, n_parts=4).collect()
    return {r["node"]: r["label"] for r in out}


def test_two_cliques_with_bridge(spark):
    # K4 on {0..3} + K4 on {10..13} joined by one bridge 3–10: each
    # clique must converge to its own min label; the bridge must not
    # merge them (each endpoint has 3 in-clique votes vs 1 across).
    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    labels = _run(spark, list(range(4)) + list(range(10, 14)), k1 + k2 + [(3, 10)])
    assert all(labels[n] == 0 for n in range(4))
    assert all(labels[n] == 10 for n in range(10, 14))


def test_isolated_node_keeps_own_label(spark):
    labels = _run(spark, [1, 2, 7], [(1, 2)])
    assert labels[7] == 7
    assert labels[1] == labels[2] == 1


def test_tie_breaks_to_smallest_label(spark):
    # star center 5 with leaves 1 and 2: round 1 gives the center a
    # three-way closed-neighborhood tie → must pick label 1 (smallest),
    # never randomly; the whole star then converges to 1
    labels = _run(spark, [1, 2, 5], [(1, 5), (2, 5)])
    assert labels == {1: 1, 2: 1, 5: 1}


def test_parity_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in LG.label_propagation(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = [
        tuple(r) for r in con.execute(LG.LABEL_PROPAGATION_SQL).fetchall()
    ]
    assert got == want
    assert len(got) == 500
    # communities actually formed: fewer distinct labels than nodes
    assert len({c for _, c in got}) < len(got)
