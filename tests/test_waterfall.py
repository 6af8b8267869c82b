"""Waterfall cascade core vs a pure-Python unique-key simulation."""

import random
from collections import Counter

from biomedical_entity_linking_spark.operators.waterfall import (
    waterfall_link,
    waterfall_link_over,
)


def _python_waterfall(recs, n_keys):
    """recs: list of (rec_id, side, k1..kn) → sorted (id_a, id_b, pass)."""
    pool = list(recs)
    links = []
    for i in range(n_keys):
        cnt = Counter((r[1], r[2 + i]) for r in pool if r[2 + i] is not None)
        uniq = {}
        for r in pool:
            k = r[2 + i]
            if k is not None and cnt[(r[1], k)] == 1:
                uniq[(r[1], k)] = r[0]
        taken = set()
        for (side, k), rid in uniq.items():
            if side == "a" and ("b", k) in uniq:
                links.append((rid, uniq[("b", k)], i + 1))
                taken.add(rid)
                taken.add(uniq[("b", k)])
        pool = [r for r in pool if r[0] not in taken]
    return sorted(links)


def test_waterfall_core_matches_simulation(spark):
    # adversarial random two-file corpus: tiny key spaces force
    # ambiguity, fall-through, and cross-pass priority; None keys
    # must sit passes out
    rng = random.Random(73)
    recs = []
    for i in range(400):
        side = "a" if i % 2 == 0 else "b"
        k1 = f"n{rng.randrange(150)}" if rng.random() > 0.1 else None
        k2 = f"p{rng.randrange(40)}" if rng.random() > 0.1 else None
        k3 = f"h{rng.randrange(300)}"
        recs.append((i, side, k1, k2, k3))
    got = [
        (r.id_a, r.id_b, r.pass_no)
        for r in waterfall_link_over(
            spark.createDataFrame(
                recs, "rec_id bigint, side string, k1 string, k2 string,"
                " k3 string"
            ),
            ["k1", "k2", "k3"],
        ).collect()
    ]
    assert got == _python_waterfall(recs, 3)
    assert len(got) > 10  # the shape is non-degenerate
    # 1:1 overall: no record appears twice
    ids = [x for a, b, _ in got for x in (a, b)]
    assert len(ids) == len(set(ids))


def test_waterfall_planted_classes(spark):
    sf = "/root/testdata/sf0.001"
    rows = waterfall_link(spark, sf).collect()
    n_groups = (
        spark.read.parquet(f"{sf}/documents.parquet").count() // 2
    )
    by_pass = Counter(r.pass_no for r in rows)
    for r in rows:
        m = r.id_a // 2
        assert r.id_b == r.id_a + 1  # the planted partner, never a stranger
        c = m % 4
        if r.pass_no == 1:
            assert c == 0
        elif r.pass_no == 2:
            # odd-t class-1 groups only: the even-t ones are ambiguous
            assert c == 1 and (m // 8) % 2 == 1
        else:
            # pass 3 rescues the ambiguous class-1 groups + class 2
            assert (c == 1 and (m // 8) % 2 == 0) or c == 2
    # every class-0/1/2 group links, every class-3 group does not
    linked_groups = {r.id_a // 2 for r in rows}
    for m in range(n_groups):
        assert (m in linked_groups) == (m % 4 != 3)
    assert set(by_pass) == {1, 2, 3}
