"""G5 exact semantics: entity-anchored cluster readoff + the reference's
cluster invariants (``eval_cluster_linking.py:149-257``, asserts
``:253-255``)."""

import pytest
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.clusters import (
    entity_anchored_readoff,
    entity_cluster_accuracy,
)


def _bipartite(spark):
    # components: {E1, m1, m2} (healthy), {E2, m3} (healthy),
    # {m4, m5} (no entity), {E3, E4, m6} (multi entity), {E5} (singleton —
    # excluded by the size>=2 filter), {m7} (singleton mention)
    labels = spark.createDataFrame(
        [
            ("E1", "c1"), ("m1", "c1"), ("m2", "c1"),
            ("E2", "c2"), ("m3", "c2"),
            ("m4", "c3"), ("m5", "c3"),
            ("E3", "c4"), ("E4", "c4"), ("m6", "c4"),
            ("E5", "c5"),
            ("m7", "c6"),
        ],
        "node string, component string",
    )
    types = labels.select(
        "node", F.col("node").startswith("E").alias("is_entity")
    )
    return labels, types


def test_invariant_counters_and_assignments(spark):
    labels, types = _bipartite(spark)
    assignments, inv = entity_anchored_readoff(labels, types, strict=False)
    assert inv == {
        "n_clusters": 4,  # size >= 2 only (E5, m7 singletons excluded)
        "clusters_wo_entity": 1,   # c3
        "clusters_multi_entity": 1,  # c4
        "n_mentions_labeled": 4,   # m1 m2 m3 m6 (c3's mentions unlabeled)
    }
    got = {
        r["node"]: r["predicted_entity"] for r in assignments.collect()
    }
    # prediction = MIN entity node of the component (reference cluster[0])
    assert got == {"m1": "E1", "m2": "E1", "m3": "E2", "m6": "E3"}


def test_strict_raises_like_reference_asserts(spark):
    labels, types = _bipartite(spark)
    with pytest.raises(AssertionError, match="no entity"):
        entity_anchored_readoff(labels, types, strict=True)


def test_strict_passes_on_healthy_partition(spark):
    labels = spark.createDataFrame(
        [("E1", "c1"), ("m1", "c1"), ("E2", "c2"), ("m2", "c2"), ("m3", "c2")],
        "node string, component string",
    )
    types = labels.select(
        "node", F.col("node").startswith("E").alias("is_entity")
    )
    assignments, inv = entity_anchored_readoff(labels, types, strict=True)
    assert inv["clusters_wo_entity"] == 0
    assert inv["clusters_multi_entity"] == 0
    assert inv["n_mentions_labeled"] == 3


def test_cluster_accuracy_multi_cui_gold(spark):
    """Correct = gold CUIs ∩ predicted CUI ≠ ∅ (isdisjoint negated,
    eval_cluster_linking.py:236-246; multi-CUI gold :222-225)."""
    labels = spark.createDataFrame(
        [("E1", "c1"), ("m1", "c1"), ("m2", "c1"), ("E2", "c2"), ("m3", "c2")],
        "node string, component string",
    )
    types = labels.select(
        "node", F.col("node").startswith("E").alias("is_entity")
    )
    assignments, _ = entity_anchored_readoff(labels, types)
    gold = spark.createDataFrame(
        [
            ("m1", ["C001"]),            # correct (E1 -> C001)
            ("m2", ["C999", "C001"]),    # correct via second gold CUI
            ("m3", ["C001"]),            # wrong (E2 -> C002)
        ],
        "node string, gold_cuis array<string>",
    )
    cuis = spark.createDataFrame(
        [("E1", "C001"), ("E2", "C002")], "node string, cui string"
    )
    res = entity_cluster_accuracy(assignments, gold, cuis)
    assert res == {"n_evaluated": 3, "n_correct": 2, "accuracy": 2 / 3}


def test_pipeline_entity_anchored_manifest_counters(spark, tmp_path):
    """entity_urls flows into run_pipeline: component labels anchor on the
    entity page, and the clusters manifest carries the invariants."""
    from biomedical_entity_linking_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    html = lambda t: f"<html><head><title>{t}</title></head><body>b</body></html>".encode()
    # three near-identical pages -> one cluster; /canonical marked as entity
    rows = [
        (f"https://{m}ex.com/alpha-beta-gamma-delta", None,
         html("Alpha Beta Gamma Delta"),
         "Alpha Beta Gamma Delta\nb", "eng")
        for m in ("www.", "m.", "")
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    ents = spark.createDataFrame(
        [("https://ex.com/alpha-beta-gamma-delta",)], "url string"
    )
    out = run_pipeline(
        spark, pages,
        PipelineConfig(work_dir=str(tmp_path / "wd")),
        entity_urls=ents,
    )
    comps = {r["url"]: r["component"] for r in out["clusters"].collect()}
    # every member labels to the ENTITY url, not the min-rid url
    assert set(comps.values()) == {"https://ex.com/alpha-beta-gamma-delta"}
    inv = out["counters"]["clusters"]["entity_invariants"]
    assert inv["clusters_wo_entity"] == 0
    assert inv["clusters_multi_entity"] == 0
    assert inv["n_clusters"] == 1
    assert inv["n_mentions_labeled"] == 2
