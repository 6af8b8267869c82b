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
