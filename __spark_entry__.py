"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline on a
deterministic synthetic pages corpus sized for sf0.001. ``queries()`` /
``oracle_sql()`` cover the operator inventory from SURVEY.md §2: the ER
pipeline stages (rows-only — iterative CC is not SQL-expressible), the
dedup family, text analysis, similarity search (G8-dispatched ANN with
size-switch-mirroring oracles), the k-ladder joint-graph family, the
ranked-candidate evaluation metrics, mention-surface operators, and the
relational operator-coverage queries (aggregations, joins, windows, set
ops) on the TPC-H-ish tables — 91 entries, 90 with DuckDB oracles
(``er_clusters`` is rows-only by design: iterative CC).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import dedup as D
from biomedical_entity_linking_spark.operators import evaluation as EV
from biomedical_entity_linking_spark.operators import events_analytics as EA
from biomedical_entity_linking_spark.operators import ladder as LD
from biomedical_entity_linking_spark.operators import mentions as MN
from biomedical_entity_linking_spark.operators import multimodal as MM
from biomedical_entity_linking_spark.operators import metrics as MT
from biomedical_entity_linking_spark.operators import similarity as SIM
from biomedical_entity_linking_spark.operators import text_analysis as TA
from biomedical_entity_linking_spark.operators import setjoin as SJ
from biomedical_entity_linking_spark.operators import editjoin as EJ
from biomedical_entity_linking_spark.operators import ml_features as MLF
from biomedical_entity_linking_spark.operators import metablocking as MB
from biomedical_entity_linking_spark.operators import containment as CT
from biomedical_entity_linking_spark.operators import waterfall as WF
from biomedical_entity_linking_spark.operators import pprl as PP
from biomedical_entity_linking_spark.operators import grouplink as GL
from biomedical_entity_linking_spark.operators import sketch as SK
from biomedical_entity_linking_spark.operators import string_scores as SS
from biomedical_entity_linking_spark.operators import survivorship as SV
from biomedical_entity_linking_spark.operators import tfidf as TI
from biomedical_entity_linking_spark.operators import asof as AO
from biomedical_entity_linking_spark.operators import er_quality as EQ
from biomedical_entity_linking_spark.operators import fellegi_sunter as FS
from biomedical_entity_linking_spark.operators import phonetic_blocking as PH
from biomedical_entity_linking_spark.operators import incremental as IC
from biomedical_entity_linking_spark.operators import kcore as KC
from biomedical_entity_linking_spark.operators import linkgraph as LG
from biomedical_entity_linking_spark.operators import weburl as WU

# ---------------------------------------------------------------------------
# flagship: end-to-end ER pipeline on synthetic pages
# ---------------------------------------------------------------------------

_SF_ENTITIES = {  # pages-corpus size per sf dir (deterministic, seed=42)
    "sf0.001": 120,
    "sf0.01": 400,
    "sf0.1": 4000,
}


def _er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from biomedical_entity_linking_spark.data.generator import (
        corpus_to_spark,
        generate_corpus,
    )
    from biomedical_entity_linking_spark.pipeline import PipelineConfig, run_pipeline

    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    n_entities = _SF_ENTITIES.get(sf_name, 120)
    corpus = generate_corpus(n_entities=n_entities, seed=42)
    pages, _ = corpus_to_spark(spark, corpus)
    cfg = PipelineConfig(work_dir=tempfile.mkdtemp(prefix="er_pipeline_"))
    out = run_pipeline(spark, pages, cfg)
    return out["clusters"].orderBy("url")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full blocking → scoring → CC pipeline at sf0.001 scale."""
    return _er_clusters(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# relational operator coverage (TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6-style multi-agg groupBy with pre-filter (SURVEY §2.4)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-family 3-way join + agg + deterministic top-k (J1, O2)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q_TOP_REVENUE_ORDERS_SQL = """
SELECT o_orderkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_name
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_first_ship_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 window argmin: first shipment per supplier via row_number
    (reference: rank-argmin canonical name, ``umls_utils.py:232``)."""
    from pyspark.sql import Window as W

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_suppkey", "l_orderkey", "l_shipdate")
        .orderBy("l_suppkey")
    )


Q_FIRST_SHIP_SQL = """
SELECT l_suppkey, l_orderkey, l_shipdate
FROM (
  SELECT l_suppkey, l_orderkey, l_shipdate,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
  FROM lineitem
)
WHERE rn = 1
ORDER BY l_suppkey
"""


def q_order_priority_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 contingency crosstab via pivot with explicit values."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


Q_CROSSTAB_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_user_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A13 per-key stats incl. countDistinct on the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


Q_USER_EVENT_STATS_SQL = """
SELECT user_id,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       round(sum(value), 6) AS total_value,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family lag window: mean inter-event gap per user (seconds)."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microseconds keep both engines exact (timestamps carry
    # sub-second precision; float epoch seconds would diverge in the sum)
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.withColumn("gap_us", epoch_us - F.lag(epoch_us).over(w))
    return (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum("gap_us").alias("sum_gap_us"),
            F.count("*").alias("n_gaps"),
            F.round(F.sum("gap_us") / F.count("*") / 1e6, 6).alias("avg_gap_sec"),
        )
        .orderBy("user_id")
    )


Q_EVENT_GAPS_SQL = """
SELECT user_id,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
       count(*) AS n_gaps,
       round(CAST(sum(gap_us) AS BIGINT) / count(*) / 1e6, 6) AS avg_gap_sec
FROM (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS gap_us
  FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


def q_purchasers_who_clicked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 set-op intersection via left-semi joins (reference: split-overlap
    stats, ``statistics.py:22-58``)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clickers.join(buyers, "user_id", "left_semi").orderBy("user_id")


Q_PURCHASERS_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


def q_part_vote_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/W4: count-based vote with tie-grouped dense_rank (reference:
    per-mention CUI vote counts ranked by count, ``evaluate.py:122-150``).
    Keeps every part tied at the top count per supplier."""
    from pyspark.sql import Window as W

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    votes = li.groupBy("l_suppkey", "l_partkey").agg(F.count("*").alias("n_votes"))
    w = W.partitionBy("l_suppkey").orderBy(F.col("n_votes").desc())
    return (
        votes.withColumn("vote_rank", F.dense_rank().over(w))
        .filter(F.col("vote_rank") == 1)
        .select("l_suppkey", "l_partkey", "n_votes")
        .orderBy("l_suppkey", "l_partkey")
    )


Q_PART_VOTE_RANK_SQL = """
SELECT l_suppkey, l_partkey, n_votes
FROM (
  SELECT l_suppkey, l_partkey, count(*) AS n_votes,
         dense_rank() OVER (PARTITION BY l_suppkey ORDER BY count(*) DESC)
           AS vote_rank
  FROM lineitem
  GROUP BY l_suppkey, l_partkey
)
WHERE vote_rank = 1
ORDER BY l_suppkey, l_partkey
"""


def q_order_part_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3 set semantics over collected arrays (reference: gold∩pred
    overlap ``evaluate.py:216-227``, all-in/any-in eval modes): per order,
    the sorted part set, whether it overlaps the hot-part list
    (arrays_overlap = relaxed mode), and whether every part is hot
    (forall = strict mode)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    hot = [1, 2, 3, 5, 8, 13, 21, 34]
    sets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    hot_arr = F.array(*[F.lit(x) for x in hot])
    return (
        sets.select(
            "l_orderkey",
            F.size("parts").alias("n_parts"),
            F.arrays_overlap("parts", hot_arr).alias("any_hot"),
            F.forall("parts", lambda p: p.isin(hot)).alias("all_hot"),
        )
        .orderBy("l_orderkey")
    )


_HOT_SQL = "[1, 2, 3, 5, 8, 13, 21, 34]"

Q_ORDER_PART_SETS_SQL = f"""
SELECT l_orderkey,
       len(parts) AS n_parts,
       list_has_any(parts, {_HOT_SQL}) AS any_hot,
       len(list_filter(parts, p -> NOT list_contains({_HOT_SQL}, p))) = 0
         AS all_hot
FROM (
  SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS parts
  FROM lineitem
  GROUP BY l_orderkey
)
ORDER BY l_orderkey
"""


def q_dup_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 duplicate-symbol counts (reference: gene symbols with
    value_counts > 1, ``extract_ncbi_gene.py:36-42``): first token of
    p_name as the 'symbol', keep symbols appearing on >1 part."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    sym = F.element_at(F.split(F.col("p_name"), " "), 1)
    return (
        part.select(sym.alias("symbol"))
        .groupBy("symbol")
        .count()
        .filter(F.col("count") > 1)
        .select("symbol", F.col("count").alias("n_parts"))
        .orderBy("symbol")
    )


Q_DUP_PART_NAMES_SQL = """
SELECT symbol, count(*) AS n_parts
FROM (SELECT string_split(p_name, ' ')[1] AS symbol FROM part)
GROUP BY symbol
HAVING count(*) > 1
ORDER BY symbol
"""


def q_filtered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 compound boolean quality mask + F6 startswith filters
    (reference: the Entrez gene quality filter — taxa ∈ set ∧ type ∉ set ∧
    desc ≠ x ∧ ¬startswith, ``ontology.py:283-289``,
    ``extract_ncbi_gene.py:20-33``)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        part.filter(
            F.col("p_size").isin(1, 5, 9, 13, 17, 21)
            & ~F.col("p_type").startswith("ECONOMY")
            & (F.col("p_brand") != "Brand#23")
            & F.col("p_name").startswith("s")
        )
        .select("p_partkey", "p_brand", "p_type", "p_size", "p_name")
        .orderBy("p_partkey")
    )


Q_FILTERED_PARTS_SQL = """
SELECT p_partkey, p_brand, p_type, p_size, p_name
FROM part
WHERE p_size IN (1, 5, 9, 13, 17, 21)
  AND NOT starts_with(p_type, 'ECONOMY')
  AND p_brand <> 'Brand#23'
  AND starts_with(p_name, 's')
ORDER BY p_partkey
"""


def q_ordered_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 ordered dedup preserving first occurrence (reference: candidate
    list dedup, ``evaluate.py:81-119``): per user, event types in first-
    arrival order, deduped, via aggregate() over the collected sequence."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("seq")
        )
    )
    dedup = F.aggregate(
        F.transform(F.col("seq"), lambda s: s["event_type"]),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    # string-serialized so the driver's pandas canonicalization (which
    # sorts/hashes cell values) never sees an unhashable list cell
    return seq.select(
        "user_id", F.array_join(dedup, ",").alias("type_order")
    ).orderBy("user_id")


Q_ORDERED_DEDUP_SQL = """
SELECT user_id,
       array_to_string(list(event_type ORDER BY first_rn), ',') AS type_order
FROM (
  SELECT user_id, event_type, min(rn) AS first_rn
  FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
  )
  GROUP BY user_id, event_type
)
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is the DRIVER's correctness-sampling order (the
    driver oracle-checks the first 50 entries): slots 2-50 hold, in
    priority order, (a) the 13 queries that had never received a driver
    oracle row through round 5 (VERDICT r5 "What's missing" #1), (b) the
    12 queries whose internals changed in the r6 optimization round, and
    (c) the round-4-green queries untouched since. ``bench.py`` times
    every entry regardless of order (it sorts names), so this ordering
    affects verification coverage only, never measurement."""
    return {
        # flagship ER pipeline (rows-only: iterative CC not SQL-expressible)
        "er_clusters": _er_clusters,
        # --- (a) never driver-oracle-checked before round 6 -------------
        # Fellegi–Sunter probabilistic linkage (EM-estimated weights)
        "fs_em_weights": FS.fs_em_weights,
        "fs_pair_posteriors": FS.fs_pair_posteriors,
        "fs_uncertain_pairs": FS.fs_uncertain_pairs,
        "fs_mutual_match": FS.fs_mutual_match,
        # Splink-style term-frequency-adjusted FS posteriors
        "fs_tf_posteriors": FS.fs_tf_posteriors,
        # privacy-preserving linkage: CLK Bloom encode + Dice verify
        "clk_linkage": PP.clk_linkage,
        # two-level household linkage: member-Dice + mutual-best 1:1
        "group_linkage": GL.group_linkage,
        # candidate-pair ML feature-table export (Magellan/Splink shape)
        "pair_features": MLF.pair_features,
        # phonetic keys + multi-rule blocking plan evaluation
        "multipass_blocking": PH.multipass_blocking,
        # blocking-graph pruning (Papadakis meta-blocking, CBS + WNP)
        "metablocking_prune": MB.metablocking_prune,
        "event_sessions": EA.event_sessions,
        "funnel_conversion": EA.funnel_conversion,
        "retention_cohorts": EA.retention_cohorts,
        # --- (b) internals changed by the r6 optimization round ---------
        # deterministic multi-pass unique-key cascade (Census-style)
        "waterfall_link": WF.waterfall_link,
        "label_propagation": LG.label_propagation,
        # 3-core peeling over the bounded-depth onion graph (6 rounds)
        "kcore_decomposition": KC.kcore_decomposition,
        "pagerank": LG.pagerank,
        "minhash_lsh_candidates": D.minhash_lsh_candidates,
        "simhash_neardup": D.simhash_neardup,
        "ngram_jaccard_neardup": D.ngram_jaccard_neardup,
        # near-dup cluster formation (LSH edges → connected components)
        "neardup_clusters": D.neardup_clusters,
        "embedding_neardup": D.embedding_neardup,
        "prefix_jaccard_join": SJ.prefix_jaccard_join,
        # exact bounded-edit-distance self-join (segment pigeonhole)
        "edit_distance_join": EJ.edit_distance_join,
        # asymmetric set-containment join (quote/syndication detector)
        "containment_join": CT.containment_join,
        "lm_fluency": TA.lm_fluency,
        "domain_posterior_scores": TA.domain_posterior_scores,
        # --- (c) round-4 green, code untouched since ---------------------
        # similarity search + labeled-candidate evaluation
        "cosine_topk": SIM.cosine_topk,
        "ivf_topk": SIM.ivf_topk,
        "proto_topk": SIM.proto_topk,
        "knn_label_recall": EV.knn_label_recall,
        "ladder_graphs": LD.ladder_graphs,
        "recall_modes": MT.recall_modes,
        "map_at_k": MT.map_at_k,
        "precision_at_k": MT.precision_at_k,
        "failure_attribution": MT.failure_attribution,
        "chi_square_flags": MT.chi_square_flags,
        "content_tokens": EV.content_tokens,
        "props_value_stats": EV.props_value_stats,
        # mention-surface operators
        "mention_spans": MN.mention_spans,
        "offsets_roundtrip": MN.offsets_roundtrip,
        "source_norm_stats": MN.source_norm_stats,
        # relational coverage
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "first_ship_per_supplier": q_first_ship_per_supplier,
        "order_priority_crosstab": q_order_priority_crosstab,
        "user_event_stats": q_user_event_stats,
        "event_gaps": q_event_gaps,
        "part_vote_rank": q_part_vote_rank,
        "order_part_sets": q_order_part_sets,
        "ordered_dedup_first": q_ordered_dedup_first,
        # --- past the driver's 50-row window (green r5 rows on file) -----
        # dedup family
        "exact_dedup": D.exact_dedup,
        "simhash": D.simhash,
        "dup_spans": D.dup_spans,
        "decontamination": D.decontamination,
        # text analysis
        "token_stats": TA.token_stats,
        "quality_scores": TA.quality_scores,
        "lang_id": TA.lang_id,
        "fingerprints": TA.fingerprints,
        "repetition_scores": TA.repetition_scores,
        # training-mix operators
        "stratified_sample": TA.stratified_sample,
        "shard_packing": TA.shard_packing,
        "vocab_topk": TA.vocab_topk,
        "pii_scrub": TA.pii_scrub,
        "leakage_safe_split": TA.leakage_safe_split,
        # web-crawl key canonicalization
        "pair_scores": SS.pair_scores,
        "tfidf_cosine_topk": TI.tfidf_cosine_topk,
        "triangle_count": LG.triangle_count,
        "blocking_quality": EQ.blocking_quality,
        "bcubed_quality": EQ.bcubed_quality,
        "ari_quality": EQ.ari_quality,
        # MUC link-based cluster agreement (Vilain 1995), same sys/gold
        "muc_quality": EQ.muc_quality,
        # entropy-based V-measure (Rosenberg 2007), log-binned integer-exact
        "vmeasure_quality": EQ.vmeasure_quality,
        # BLANC bilateral link/non-link pair agreement (Recasens 2011)
        "blanc_quality": EQ.blanc_quality,
        "incremental_linkage": IC.incremental_linkage,
        "survivorship": SV.survivorship,
        "cluster_conflicts": SV.cluster_conflicts,
        "click_attribution_asof": AO.click_attribution_asof,
        "length_quantiles": TA.length_quantiles,
        "vocab_hll_registers": SK.vocab_hll_registers,
        "token_cms_registers": SK.token_cms_registers,
        "benchmark_bloom_bits": SK.benchmark_bloom_bits,
        "length_histogram": SK.length_histogram,
        "url_dedup": WU.url_dedup,
        "host_stats": WU.host_stats,
        "snapshot_diff": WU.snapshot_diff,
        "media_bytes_stats": MM.media_bytes_stats,
        "purchasers_who_clicked": q_purchasers_who_clicked,
        "dup_part_names": q_dup_part_names,
        "filtered_parts": q_filtered_parts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": D.EXACT_DEDUP_SQL,
        "ngram_jaccard_neardup": D.NGRAM_JACCARD_SQL,
        "minhash_lsh_candidates": D.MINHASH_LSH_SQL,
        "simhash": D.SIMHASH_SQL,
        "simhash_neardup": D.SIMHASH_NEARDUP_SQL,
        "embedding_neardup": D._finalize_emb_neardup_sql(),
        "dup_spans": D.DUP_SPANS_SQL,
        "decontamination": D.DECONTAMINATION_SQL,
        "token_stats": TA.TOKEN_STATS_SQL,
        "quality_scores": TA.QUALITY_SCORES_SQL,
        "lang_id": TA.LANG_ID_SQL,
        "fingerprints": TA.FINGERPRINTS_SQL,
        "repetition_scores": TA.REPETITION_SCORES_SQL,
        "stratified_sample": TA.STRATIFIED_SAMPLE_SQL,
        "shard_packing": TA.SHARD_PACKING_SQL,
        "vocab_topk": TA.VOCAB_TOPK_SQL,
        "pii_scrub": TA.PII_SCRUB_SQL,
        "leakage_safe_split": TA.LEAKAGE_SAFE_SPLIT_SQL,
        "domain_posterior_scores": TA.DOMAIN_POSTERIOR_SQL,
        "lm_fluency": TA.LM_FLUENCY_SQL,
        "pair_scores": SS.PAIR_SCORES_SQL,
        "tfidf_cosine_topk": TI.TFIDF_COSINE_TOPK_SQL,
        "pagerank": LG.PAGERANK_SQL,
        "triangle_count": LG.TRIANGLE_COUNT_SQL,
        "label_propagation": LG.LABEL_PROPAGATION_SQL,
        "kcore_decomposition": KC.KCORE_DECOMPOSITION_SQL,
        "blocking_quality": EQ.BLOCKING_QUALITY_SQL,
        "bcubed_quality": EQ.BCUBED_QUALITY_SQL,
        "ari_quality": EQ.ARI_QUALITY_SQL,
        "muc_quality": EQ.MUC_QUALITY_SQL,
        "vmeasure_quality": EQ.VMEASURE_QUALITY_SQL,
        "blanc_quality": EQ.BLANC_QUALITY_SQL,
        "incremental_linkage": IC.INCREMENTAL_LINKAGE_SQL,
        "survivorship": SV.SURVIVORSHIP_SQL,
        "cluster_conflicts": SV.CLUSTER_CONFLICTS_SQL,
        "click_attribution_asof": AO.CLICK_ATTRIBUTION_ASOF_SQL,
        "length_quantiles": TA.LENGTH_QUANTILES_SQL,
        "vocab_hll_registers": SK.VOCAB_HLL_REGISTERS_SQL,
        "token_cms_registers": SK.TOKEN_CMS_REGISTERS_SQL,
        "benchmark_bloom_bits": SK.BENCHMARK_BLOOM_BITS_SQL,
        "length_histogram": SK.LENGTH_HISTOGRAM_SQL,
        "url_dedup": WU.URL_DEDUP_SQL,
        "host_stats": WU.HOST_STATS_SQL,
        "snapshot_diff": WU.SNAPSHOT_DIFF_SQL,
        "neardup_clusters": D.NEARDUP_CLUSTERS_SQL,
        "prefix_jaccard_join": SJ.PREFIX_JACCARD_SQL,
        "edit_distance_join": EJ.EDIT_DISTANCE_JOIN_SQL,
        "containment_join": CT.CONTAINMENT_JOIN_SQL,
        "waterfall_link": WF.WATERFALL_LINK_SQL,
        "fs_tf_posteriors": FS.FS_TF_POSTERIORS_SQL,
        "clk_linkage": PP.CLK_LINKAGE_SQL,
        "group_linkage": GL.GROUP_LINKAGE_SQL,
        "pair_features": MLF.PAIR_FEATURES_SQL,
        "fs_em_weights": FS.FS_EM_WEIGHTS_SQL,
        "fs_pair_posteriors": FS.FS_PAIR_POSTERIORS_SQL,
        "fs_uncertain_pairs": FS.FS_UNCERTAIN_PAIRS_SQL,
        "fs_mutual_match": FS.FS_MUTUAL_MATCH_SQL,
        "multipass_blocking": PH.MULTIPASS_BLOCKING_SQL,
        "metablocking_prune": MB.METABLOCKING_PRUNE_SQL,
        "cosine_topk": SIM.COSINE_TOPK_SQL,
        "ivf_topk": SIM.IVF_TOPK_SQL,
        "proto_topk": SIM.PROTO_TOPK_SQL,
        "knn_label_recall": EV.KNN_LABEL_RECALL_SQL,
        "ladder_graphs": LD.LADDER_GRAPHS_SQL,
        "recall_modes": MT.RECALL_MODES_SQL,
        "map_at_k": MT.MAP_AT_K_SQL,
        "precision_at_k": MT.PRECISION_AT_K_SQL,
        "failure_attribution": MT.FAILURE_ATTRIBUTION_SQL,
        "chi_square_flags": MT.CHI_SQUARE_FLAGS_SQL,
        "content_tokens": EV.CONTENT_TOKENS_SQL,
        "props_value_stats": EV.PROPS_VALUE_STATS_SQL,
        "mention_spans": MN.MENTION_SPANS_SQL,
        "offsets_roundtrip": MN.OFFSETS_ROUNDTRIP_SQL,
        "source_norm_stats": MN.SOURCE_NORM_STATS_SQL,
        "media_bytes_stats": MM.MEDIA_BYTES_STATS_SQL,
        "pricing_summary": Q_PRICING_SUMMARY_SQL,
        "top_revenue_orders": Q_TOP_REVENUE_ORDERS_SQL,
        "first_ship_per_supplier": Q_FIRST_SHIP_SQL,
        "order_priority_crosstab": Q_CROSSTAB_SQL,
        "user_event_stats": Q_USER_EVENT_STATS_SQL,
        "event_gaps": Q_EVENT_GAPS_SQL,
        "event_sessions": EA.EVENT_SESSIONS_SQL,
        "funnel_conversion": EA.FUNNEL_CONVERSION_SQL,
        "retention_cohorts": EA.RETENTION_COHORTS_SQL,
        "purchasers_who_clicked": Q_PURCHASERS_SQL,
        "part_vote_rank": Q_PART_VOTE_RANK_SQL,
        "order_part_sets": Q_ORDER_PART_SETS_SQL,
        "ordered_dedup_first": Q_ORDERED_DEDUP_SQL,
        "dup_part_names": Q_DUP_PART_NAMES_SQL,
        "filtered_parts": Q_FILTERED_PARTS_SQL,
    }
