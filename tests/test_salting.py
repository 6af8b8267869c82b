"""Two-sided salted self-join (the EXPLAIN.md hot-key escape hatch)."""

import itertools

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.functions.salting import (
    salted_block_self_join,
)


def _keyed(spark, blocks: dict[int, list[int]]):
    rows = [
        ("lsh", k, rid) for k, rids in blocks.items() for rid in rids
    ]
    return spark.createDataFrame(rows, "key_kind string, key long, rid long")


def _naive_pairs(blocks: dict[int, list[int]]) -> set[tuple[int, int]]:
    out = set()
    for rids in blocks.values():
        for a, b in itertools.combinations(sorted(set(rids)), 2):
            out.add((a, b))
    return out


def test_salted_join_exhaustive_and_exactly_once(spark):
    """Every within-block pair appears exactly once — including across a
    hot block that shards into s^2 composite keys."""
    blocks = {
        1: list(range(100, 160)),          # hot: 60 rows → s=6 at 10/task
        2: [7, 9, 13],
        3: [501],                           # singleton: no pairs
        4: [7, 1000],                       # rid 7 also in block 2
    }
    keyed = _keyed(spark, blocks)
    got = [
        (r["id_a"], r["id_b"])
        for r in salted_block_self_join(keyed, rows_per_task=10).collect()
    ]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == _naive_pairs(blocks)


def test_salted_join_matches_uncapped_block_join(spark):
    """Equivalence against the production pair generator with the cap
    effectively disabled (the salted join IS the exhaustive semantics)."""
    from biomedical_entity_linking_spark.operators.blocking import (
        generate_candidate_pairs,
    )

    blocks = {k: [k * 100 + i * 7 for i in range(k + 2)] for k in range(1, 8)}
    keyed = _keyed(spark, blocks)
    salted = {
        (r["id_a"], r["id_b"])
        for r in salted_block_self_join(keyed, rows_per_task=4).collect()
    }
    uncapped, _ = generate_candidate_pairs(keyed, max_block_size=10**9)
    want = {(r["rid_a"], r["rid_b"]) for r in uncapped.collect()}
    assert salted == want


def test_salted_join_bounds_task_size(spark):
    """The hot key's comparison volume spreads over s^2 composite shard
    pairs; no composite key carries more than ~rows_per_task rows a side."""
    blocks = {1: list(range(1000, 1080))}  # 80 rows, rows_per_task=10 → s=8
    keyed = _keyed(spark, blocks)
    s = 8
    with_shard = keyed.select(
        "key", F.pmod(F.col("rid"), F.lit(s)).alias("sh")
    )
    per_shard = [r["n"] for r in with_shard.groupBy("sh").agg(
        F.count("*").alias("n")).collect()]
    assert max(per_shard) <= 10 + 5  # pmod spread ≈ block/s per side
    # and the join itself still returns the full pair set
    got = salted_block_self_join(keyed, rows_per_task=10)
    assert got.count() == 80 * 79 // 2
