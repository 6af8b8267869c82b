"""Cluster readoff + pairwise precision/recall/F1 evaluation.

Reference semantics: accuracy is read off clusters — every mention in a
component inherits the component's entity label, and a prediction is correct
when gold ∩ predicted ≠ ∅ (``eval_cluster_linking.py:149-257``); recall@k /
pair metrics over gold labels (``bioel/bioel/evaluate.py:203-260``,
mean-of-boolean ``:256-258``). The web graft's gate is pairwise F1 ≥ 0.99 on
labeled candidate pairs *within the same blocking keys* (north rule): for
every candidate pair produced by blocking, gold label = same gold cluster,
prediction = same predicted component; F1 over those pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """component → size; reference keeps clusters of size ≥ 2
    (``eval_cluster_linking.py:136-144``, A18 analog)."""
    return labels.groupBy("component").agg(F.count("*").alias("size"))


def entity_anchored_readoff(
    labels: DataFrame,
    node_types: DataFrame,
    strict: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """G5 exact semantics: bipartite entity/mention cluster readoff with
    the reference's cluster invariants
    (``eval_cluster_linking.py:149-257``).

    The reference indexes entities ``0..n_entities-1`` and mentions after,
    so "``cluster[0]`` is the entity" is index arithmetic (``:188-196``);
    distributed node ids aren't ordered that way, so the entity flag is
    explicit and the prediction is the MINIMUM entity node of each
    component — the same node the reference picks whenever its invariants
    hold.

    ``labels``: (node, component) — e.g. ``connected_components`` output
    (rename ``url`` → ``node``). ``node_types``: (node, is_entity).

    Returns ``(assignments, invariants)``:

    * ``assignments`` — one row per MENTION in a size-≥2 component that
      contains an entity: (node, component, predicted_entity).
    * ``invariants`` — the reference's sanity counters (asserted zero at
      ``:253-255``): ``clusters_wo_entity``, ``clusters_multi_entity``,
      plus ``n_clusters`` (size ≥ 2, ``:136-144``) and
      ``n_mentions_labeled``. ``strict=True`` raises on violation exactly
      like the reference's asserts; ``strict=False`` surfaces them as
      lineage counters (a web-scale run reports rather than dies).
    """
    typed = labels.join(node_types.select("node", "is_entity"), "node")
    comp = typed.groupBy("component").agg(
        F.count("*").alias("size"),
        F.sum(F.col("is_entity").cast("int")).alias("n_entities"),
        F.min(F.when(F.col("is_entity"), F.col("node"))).alias(
            "predicted_entity"
        ),
    )
    clusters = comp.filter(F.col("size") >= 2)
    stats = clusters.agg(
        F.count("*").alias("n_clusters"),
        F.sum(F.when(F.col("n_entities") == 0, 1).otherwise(0)).alias("wo"),
        F.sum(F.when(F.col("n_entities") > 1, 1).otherwise(0)).alias("multi"),
    ).collect()[0]
    assignments = (
        typed.filter(~F.col("is_entity"))
        .join(
            clusters.filter(F.col("n_entities") >= 1).select(
                "component", "predicted_entity"
            ),
            "component",
        )
        .select("node", "component", "predicted_entity")
    )
    invariants = {
        "n_clusters": int(stats["n_clusters"] or 0),
        "clusters_wo_entity": int(stats["wo"] or 0),
        "clusters_multi_entity": int(stats["multi"] or 0),
        "n_mentions_labeled": int(assignments.count()),
    }
    if strict:
        # the reference's asserts (eval_cluster_linking.py:253-255)
        if invariants["clusters_wo_entity"] != 0:
            raise AssertionError(
                f"{invariants['clusters_wo_entity']} cluster(s) contain no "
                "entity node (reference asserts _debug_clusters_wo_entities"
                " == 0)"
            )
        if invariants["clusters_multi_entity"] != 0:
            raise AssertionError(
                f"{invariants['clusters_multi_entity']} cluster(s) contain "
                ">1 entity node (reference asserts "
                "_debug_clusters_w_mult_entities == 0)"
            )
    return assignments, invariants


def entity_cluster_accuracy(
    assignments: DataFrame,
    mention_gold: DataFrame,
    entity_cuis: DataFrame,
) -> dict[str, float]:
    """Reference accuracy over entity-anchored assignments: a mention is
    correct when its gold CUI set intersects the predicted entity's CUI
    (``eval_cluster_linking.py:236-246`` — ``set.isdisjoint`` negated; one
    mention can carry several gold CUIs, ``:222-225``).

    ``mention_gold``: (node, gold_cuis array<string>);
    ``entity_cuis``: (node, cui)."""
    pred = entity_cuis.select(
        F.col("node").alias("predicted_entity"), F.col("cui").alias("pred_cui")
    )
    scored = (
        assignments.join(mention_gold, "node")
        .join(pred, "predicted_entity")
        .select(
            F.array_contains(F.col("gold_cuis"), F.col("pred_cui")).alias(
                "correct"
            )
        )
    )
    row = scored.agg(
        F.count("*").alias("n"),
        F.sum(F.col("correct").cast("int")).alias("ok"),
    ).collect()[0]
    n = int(row["n"] or 0)
    ok = int(row["ok"] or 0)
    return {
        "n_evaluated": n,
        "n_correct": ok,
        "accuracy": ok / n if n else 0.0,
    }


def label_candidate_pairs(
    candidate_pairs: DataFrame,
    gold_clusters: DataFrame,
    predicted: DataFrame,
) -> DataFrame:
    """candidate_pairs(url_a, url_b) × gold(url, cluster_id) ×
    predicted(url, component) → per-pair (gold_match, pred_match)."""
    ga = gold_clusters.select(
        F.col("url").alias("url_a"), F.col("cluster_id").alias("gold_a")
    )
    gb = gold_clusters.select(
        F.col("url").alias("url_b"), F.col("cluster_id").alias("gold_b")
    )
    pa = predicted.select(
        F.col("url").alias("url_a"), F.col("component").alias("comp_a")
    )
    pb = predicted.select(
        F.col("url").alias("url_b"), F.col("component").alias("comp_b")
    )
    return (
        candidate_pairs.join(ga, "url_a")
        .join(gb, "url_b")
        .join(pa, "url_a")
        .join(pb, "url_b")
        .select(
            "url_a",
            "url_b",
            (F.col("gold_a") == F.col("gold_b")).alias("gold_match"),
            (F.col("comp_a") == F.col("comp_b")).alias("pred_match"),
        )
    )


def pairwise_prf(labeled: DataFrame) -> dict[str, float]:
    """One-pass confusion-count agg → precision/recall/F1 (A10 analog:
    conditional mean-of-boolean as an agg expression)."""
    row = labeled.agg(
        F.sum(F.when(F.col("gold_match") & F.col("pred_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("gold_match") & F.col("pred_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("gold_match") & ~F.col("pred_match"), 1).otherwise(0)).alias("fn"),
        F.count("*").alias("n_pairs"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_pairs": int(row["n_pairs"]),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
