"""Focused test for the r6 ``generate_candidate_pairs`` rewrite: the
window-cap runs over HOT blocks only, each surviving block's rids are
collected into a bounded sorted array, and the a<b pairs expand through a
nested-transform HOF (OPTIMIZATION_r06.md, er_pipeline #1). The declared
semantics are unchanged from r5: within each (key_kind, key) block of more
than one row, keep the ``max_block_size`` rows with smallest rid, emit all
rid_a < rid_b pairs among them, dedup across keys. This pins that contract
with a pure-Python reference on shapes that exercise every branch —
under-cap, exactly-at-cap, over-cap, duplicate (rid, key) rows, and a rid
that is capped out of its hot block but pairs under another key."""

import itertools

from biomedical_entity_linking_spark.operators.blocking import (
    generate_candidate_pairs,
)


def _keyed(spark, rows):
    return spark.createDataFrame(
        rows, "key_kind string, key long, rid long"
    )


def _ref_pairs(rows, cap):
    blocks: dict[tuple, list[int]] = {}
    for kind, key, rid in rows:
        blocks.setdefault((kind, key), []).append(rid)
    out = set()
    for rids in blocks.values():
        if len(rids) <= 1:
            continue
        kept = sorted(rids)[:cap]  # cap keeps the smallest-rid ROWS
        for a, b in itertools.combinations(kept, 2):
            if a < b:
                out.add((a, b))
    return out


_ROWS = (
    # hot block: 7 rows, cap 4 → only rids 100..103 may pair here
    [("lsh", 1, 100 + i) for i in range(7)]
    # exactly-at-cap block: all pairs survive
    + [("lsh", 2, r) for r in (7, 9, 13, 15)]
    # small block
    + [("snm", 3, 7), ("snm", 3, 1000)]
    # rid 106 is capped OUT of block 1 but pairs with 9 here
    + [("snm", 4, 106), ("snm", 4, 9)]
    # duplicate (rid, key) rows: size-2 block, no a<b pair, no crash
    + [("lsh", 5, 42), ("lsh", 5, 42)]
    # singleton: no pairs
    + [("lsh", 6, 77)]
)
_CAP = 4


def test_capped_pairs_match_reference(spark):
    pairs, _ = generate_candidate_pairs(_keyed(spark, _ROWS), _CAP)
    got = [(r["rid_a"], r["rid_b"]) for r in pairs.collect()]
    assert len(got) == len(set(got)), "pair dedup across keys failed"
    assert set(got) == _ref_pairs(_ROWS, _CAP)
    # the capped-out rid still pairs under its OTHER key, nowhere else
    assert (9, 106) in set(got)
    assert all(not (a == 106 or b == 106) or (a, b) == (9, 106)
               for a, b in got)


def test_capped_is_subset_of_uncapped(spark):
    keyed = _keyed(spark, _ROWS)
    capped, _ = generate_candidate_pairs(keyed, _CAP)
    uncapped, _ = generate_candidate_pairs(keyed, 10**9)
    c = {(r["rid_a"], r["rid_b"]) for r in capped.collect()}
    u = {(r["rid_a"], r["rid_b"]) for r in uncapped.collect()}
    assert c <= u
    assert u == _ref_pairs(_ROWS, 10**9)


def test_block_stats_counters(spark):
    _, stats = generate_candidate_pairs(_keyed(spark, _ROWS), _CAP)
    by_kind = {r["key_kind"]: r.asDict() for r in stats.collect()}
    lsh, snm = by_kind["lsh"], by_kind["snm"]
    assert lsh["n_blocks"] == 4 and snm["n_blocks"] == 2
    assert lsh["n_blocks_ge2"] == 3 and snm["n_blocks_ge2"] == 2
    # comparisons: C(4,2) hot-capped + C(4,2) at-cap + C(2,2→1,2)=1 dup
    assert lsh["comparisons_generated"] == 6 + 6 + 1
    assert snm["comparisons_generated"] == 1 + 1
    assert lsh["rows_capped"] == 3 and snm["rows_capped"] == 0
    assert lsh["max_block_size_seen"] == 7
    assert lsh["total_key_rows"] == 7 + 4 + 2 + 1
