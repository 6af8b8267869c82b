"""Two-sided salted self-join for hot blocking keys.

The default pipeline CAPS oversized blocks (deterministic 64-row sample,
drops counted — see ``operators/blocking.generate_candidate_pairs``) and
the EXPLAIN.md skew note argues that is the right default at 10^12 rows.
This module is the escape hatch for the deployment that must score a hot
block EXHAUSTIVELY: the classic two-sided salting decomposition.

Within each block (key), every row gets a shard ``r = pmod(id, s)``. The
naive self-join on ``key`` puts the whole block's pair set on ONE
reducer; the salted join joins on ``(key, sh_a, sh_b)``: the left side
replicates each row s times as (shard(a), j) for j in 0..s-1, the right
side as (i, shard(b)) for i in 0..s-1, so the unordered pair (a, b)
meets in EXACTLY one composite key — (shard(a), shard(b)) — and every
task holds (block/s)^2 comparisons, never more. Shard count per key:
``s = ceil(block_size / rows_per_task)``; blocks that already fit one
task get s = 1 and zero replication.

Cost model (why this is the escape hatch, not the default): replication
multiplies the hot block's shuffle volume by s and the comparison count
stays the full C(block, 2). For the viral-title key at 2x10^7 rows and
s = 2,500 that is 5x10^10 shipped rows and ~2x10^14 comparisons —
feasible to EXPRESS with bounded tasks, catastrophic to SPEND unless the
pairs genuinely matter. The per-key cap + lineage counters stay the
default for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_block_self_join(
    keyed: DataFrame,
    rows_per_task: int = 8_000,
    key_cols: tuple[str, ...] = ("key_kind", "key"),
    id_col: str = "rid",
) -> DataFrame:
    """Exhaustive within-block candidate pairs with bounded task size.

    ``keyed``: (key_cols..., id_col) — one row per (block, member).
    Returns (id_a, id_b) with id_a < id_b, each unordered pair exactly
    once, and no single reduce task handling more than ~rows_per_task^2
    comparisons regardless of how hot any key is.

    Plan shape: one aggregate for per-key shard counts (broadcast — one
    row per key), then an equi-join on (key, sh_a, sh_b). Catalyst hashes
    the composite key, so a hot block spreads over its s^2 shard pairs
    instead of one reducer; AQE never sees a skewed partition to split.
    """
    kc = [F.col(c) for c in key_cols]
    shards = (
        keyed.groupBy(*kc)
        .agg(F.count("*").alias("_bs"))
        .select(
            *kc,
            F.greatest(
                F.lit(1), F.ceil(F.col("_bs") / F.lit(rows_per_task))
            ).cast("int").alias("_s"),
        )
    )
    with_s = keyed.join(F.broadcast(shards), list(key_cols))
    my_shard = F.pmod(F.col(id_col), F.col("_s")).cast("int")
    enum = F.explode(F.sequence(F.lit(0), F.col("_s") - 1))

    # left: (shard(a), j) for every j — a's replicas cover every partner
    # shard; right: (i, shard(b)) for every i — b's replicas cover every
    # querying shard. Pair (a, b) meets only at (shard(a), shard(b)).
    left = with_s.select(
        *kc,
        F.col(id_col).alias("id_a"),
        my_shard.alias("_sh_a"),
        enum.alias("_sh_b"),
    )
    right = with_s.select(
        *kc,
        F.col(id_col).alias("id_b"),
        enum.alias("_sh_a"),
        my_shard.alias("_sh_b"),
    )
    join_keys = [*key_cols, "_sh_a", "_sh_b"]
    return (
        left.join(right, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))  # mirror + self guard (J12)
        .select("id_a", "id_b")
        # a pair can still co-block under MANY keys (16 LSH bands + snm):
        # same dedup contract as generate_candidate_pairs
        .dropDuplicates(["id_a", "id_b"])
    )
