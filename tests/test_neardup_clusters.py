"""Near-dup cluster formation (dedup.neardup_clusters): LSH candidate
edges closed into connected components — transitivity (A~B, B~C lands
all three in ONE cluster even if A,C never share a band), label = min
doc_id, singletons and clean docs excluded."""

from biomedical_entity_linking_spark.operators.dedup import (
    NEARDUP_CC_THRESH,
    neardup_clusters,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "astronauts assemble modular habitats beside the crater rim "
)
OTHER = (
    "completely different prose about distributed query engines and "
    "shuffle partitioning strategies for columnar execution at scale "
)


def _write_docs(spark, tmp_path, texts):
    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{path}/documents.parquet")
    return path


def test_transitive_chain_one_cluster(spark, tmp_path):
    texts = [
        BASE * 3 + "alpha beta gamma delta epsilon",  # d0 ~ d1
        BASE * 3,                                     # d1 ~ d0 and d2
        BASE * 3 + "zeta eta theta iota kappa",       # d2 ~ d1
        OTHER * 3,                                    # d3 ~ d4 only
        OTHER * 3 + "trailing novelty words",         # d4 ~ d3
        "a singleton document with entirely unrepeated vocabulary here",
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = neardup_clusters(spark, sf).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["doc_id"])
        assert r["cluster_size"] >= 2
    # transitive closure: the BASE chain is one cluster labeled by its
    # minimum member; the OTHER pair is a second; the singleton is absent
    assert by_cluster == {0: {0, 1, 2}, 3: {3, 4}}
    sizes = {r["cluster"]: r["cluster_size"] for r in rows}
    assert sizes == {0: 3, 3: 2}
    assert 0.0 < NEARDUP_CC_THRESH < 1.0
