"""k-ladder joint graph family (BiEncoderLightningModule.py:138-225)."""

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.ladder import (
    ENT_MOD,
    MAX_K,
    joint_graph_ladder,
    knn_ladder,
    ladder_graphs,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ladder_values():
    # reference: knn_vals = [0] + [2**i ...] (:142)
    assert knn_ladder(1) == [0, 1]
    assert knn_ladder(4) == [0, 1, 2, 4]
    assert knn_ladder(16) == [0, 1, 2, 4, 8, 16]


def test_k0_graph_is_entity_edges_only(spark):
    out = ladder_graphs(spark, SF_DIR)
    k0 = out.filter("k = 0")
    assert k0.filter("edge_type <> 'entity'").count() == 0
    n_mentions = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(f"vec_id % {ENT_MOD} <> 0")
        .count()
    )
    # exactly one nearest-entity edge per mention, in EVERY k graph (:202)
    for k in knn_ladder(MAX_K):
        assert out.filter(f"k = {k} AND edge_type = 'entity'").count() == n_mentions


def test_graphs_nest_along_the_ladder(spark):
    """The k graph's mention edges are exactly the 2k graph's first-k ranks
    — one kNN search amortized across the family (:209-221)."""
    out = ladder_graphs(spark, SF_DIR).filter("edge_type = 'mention'")
    by_k = {
        k: {(r["src"], r["dst"]) for r in out.filter(f"k = {k}").collect()}
        for k in (1, 2, 4)
    }
    assert by_k[1] <= by_k[2] <= by_k[4]
    ranks = out.filter("k = 2")
    assert ranks.agg(F.max("rank")).first()[0] <= 2


def test_ladder_feeds_cc(spark):
    """A k slice drops straight into connected components — the readoff
    the reference performs per graph (:224-240)."""
    from biomedical_entity_linking_spark.operators.connected_components import (
        connected_components,
    )

    out = ladder_graphs(spark, SF_DIR)
    k1 = out.filter("k = 1").select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    labels, _ = connected_components(k1, src="a", dst="b")
    # every mention is in some component with its nearest entity
    n_nodes = labels.count()
    assert n_nodes > 0
    assert labels.select("component").distinct().count() < n_nodes


def test_joint_graph_ladder_generic_inputs(spark):
    """The operator composes over ANY ranked NN relations (the scale path
    feeds ivf_topk output instead of the brute-force demo)."""
    me = spark.createDataFrame([(100, 1), (101, 2)], "src long, dst long")
    mm = spark.createDataFrame(
        [(100, 101, 1), (100, 102, 2), (101, 100, 1)],
        "src long, dst long, rank int",
    )
    out = joint_graph_ladder(me, mm, max_k=2)
    got = {
        (r["k"], r["src"], r["dst"], r["edge_type"])
        for r in out.collect()
    }
    assert (0, 100, 1, "entity") in got
    assert (2, 100, 102, "mention") in got
    assert (1, 100, 102, "mention") not in got  # rank 2 > k=1
    # ladder [0,1,2]: entity edges appear in all three ks
    assert sum(1 for t in got if t[1] == 100 and t[3] == "entity") == 3
