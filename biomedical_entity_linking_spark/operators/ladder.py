"""k-ladder joint graph construction (the reference's per-k graph family).

Reference semantics (``bioel/bioel/models/arboel/biencoder/model/
BiEncoderLightningModule.py:138-225``): evaluation builds ONE joint
entity-mention graph PER k in the power-of-two ladder
``[0] + [2**i for i in range(log2(knn)+1)]`` (``:142``). Every graph gets,
per mention, one edge to its nearest ENTITY (``:202-208``); graphs with
k > 0 additionally get that mention's top-k MENTION neighbors
(self-excluded, ``:193-199``; capped at k, ``:209-221``). Each graph is
then partitioned and read off via connected components, and accuracy is
reported per k (``:224-240``) — the ladder exists so one kNN search
amortizes across every k.

Spark-first shape: the two ranked nearest-neighbor relations (mention →
nearest entity; mention → ranked mention neighbors) are computed ONCE
through ``similarity.knn_join`` — the ONE G8-dispatched query/dict-sided
kNN kernel (broadcast matmul ≤ ``BRUTE_FORCE_MAX`` dictionary rows, IVF
cogroup above; never an unguarded driver collect). The per-k family is a
non-equi join of the mention-neighbor relation against the tiny ladder
table (``rank <= k`` — Catalyst turns a ≤5-row broadcast side into a
trivially cheap nested-loop join), and the entity edges cross-join the
ladder. No k-specific recompute, exactly the amortization the
reference's loop performs imperatively. Downstream consumers slice one k
(``.filter(col("k") == v)``) to feed CC
(``operators/connected_components``) or the recall ladder
(``evaluation.py``).

The demo query derives the bipartite split from the embeddings table
(``vec_id % 4 == 0`` → entity, else mention); its DuckDB oracle is built
from ``similarity.knn_join_sql`` so it mirrors the SAME size switch per
relation (gated on each relation's DICTIONARY count) and Spark↔oracle
parity holds in both regimes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import similarity as sim

MAX_K = 4
ENT_MOD = 4  # vec_id % ENT_MOD == 0 → entity node (deterministic split)


def knn_ladder(max_k: int) -> list[int]:
    """``[0] + [2**i ...]`` (BiEncoderLightningModule.py:142)."""
    return [0] + [2**i for i in range(int(math.log(max_k, 2)) + 1)]


def joint_graph_ladder(
    ment_ent_nn: DataFrame,
    ment_ment_nn: DataFrame,
    max_k: int = MAX_K,
) -> DataFrame:
    """Per-k joint graph family from precomputed NN relations.

    ``ment_ent_nn``: (src, dst) — each mention's nearest entity;
    ``ment_ment_nn``: (src, dst, rank) — ranked mention neighbors
    (self-excluded, rank 1 = best). Returns
    (k, src, dst, edge_type, rank) with rank 0 on entity edges; the k
    slice ``k = v`` is exactly the reference's ``joint_graphs[v]``.
    """
    spark = ment_ent_nn.sparkSession
    ks = spark.createDataFrame(
        [(k,) for k in knn_ladder(max_k)], "k int"
    )
    ent_edges = ment_ent_nn.crossJoin(ks).select(
        "k",
        "src",
        "dst",
        F.lit("entity").alias("edge_type"),
        F.lit(0).alias("rank"),
    )
    men_edges = (
        ment_ment_nn.filter(F.col("rank") <= max_k)
        .join(ks, F.col("rank") <= F.col("k"))
        .select("k", "src", "dst", F.lit("mention").alias("edge_type"), "rank")
    )
    return ent_edges.unionByName(men_edges).orderBy(
        "k", "src", "rank", "dst"
    )


def ladder_graphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage query: the joint graph family over the embeddings table
    with the deterministic entity/mention split (vec_id % 4 == 0 → entity).
    Output: (k, src, dst, edge_type, rank) for k ∈ [0, 1, 2, 4].

    Both NN relations route through ``similarity.knn_join`` — the shared
    G8 dispatch — so above ``BRUTE_FORCE_MAX`` dictionary rows the IVF
    cogroup kernel runs and no driver collect is reachable."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = sim._vec(emb)
    ents = e.filter(F.col("vec_id") % ENT_MOD == 0)
    ments = e.filter(F.col("vec_id") % ENT_MOD != 0)
    ment_ent = sim.knn_join(ments, ents, k=1, exclude_self=False).select(
        "src", "dst"
    )
    ment_ment = sim.knn_join(ments, ments, k=MAX_K, exclude_self=True)
    return joint_graph_ladder(ment_ent, ment_ment, MAX_K)


_LADDER_VALUES_SQL = ", ".join(f"({k})" for k in knn_ladder(MAX_K))


def ladder_graphs_sql(switch_at: int = sim.BRUTE_FORCE_MAX) -> str:
    """DuckDB oracle for ``ladder_graphs``: the two NN relations come from
    ``similarity.knn_join_sql`` with the SAME per-relation size switch the
    Spark dispatch applies (me gated on the entity count, mm on the
    mention count)."""
    me = sim.knn_join_sql(
        "me",
        query_where=f"vec_id % {ENT_MOD} <> 0",
        dict_where=f"vec_id % {ENT_MOD} = 0",
        k=1,
        exclude_self=False,
        switch_at=switch_at,
    )
    mm = sim.knn_join_sql(
        "mm",
        query_where=f"vec_id % {ENT_MOD} <> 0",
        dict_where=f"vec_id % {ENT_MOD} <> 0",
        k=MAX_K,
        exclude_self=True,
        switch_at=switch_at,
    )
    return f"""
WITH {me.strip().lstrip(",")},
{mm.strip().lstrip(",")},
ks AS (SELECT * FROM (VALUES {_LADDER_VALUES_SQL}) t(k))
SELECT k, src, dst, 'entity' AS edge_type, 0 AS rank FROM me, ks
UNION ALL
SELECT k, src, dst, 'mention' AS edge_type, CAST(mm.rank AS INT) AS rank
FROM mm JOIN ks ON mm.rank <= ks.k
ORDER BY k, src, rank, dst
"""


LADDER_GRAPHS_SQL = ladder_graphs_sql()
