"""Containment join vs pure-Python brute force over random sets."""

import random

from biomedical_entity_linking_spark.operators.containment import (
    containment_join,
    containment_join_over,
)


def _brute(sets, num, den):
    out = []
    for a, ta in sets.items():
        for b, tb in sets.items():
            if a == b:
                continue
            inter = len(ta & tb)
            if inter * den >= num * len(ta):
                out.append((a, b, inter, len(ta)))
    return sorted(out)


def test_generic_core_matches_brute_force(spark):
    rng = random.Random(20260819)
    sets = {}
    for i in range(50):
        sets[i] = frozenset(
            rng.randint(0, 60) for _ in range(rng.randint(3, 25))
        )
    # plant a literal subset pair (perfect containment both thresholds)
    sets[50] = frozenset(list(sets[0])[:3])
    rows = [(d, t) for d, ts in sets.items() for t in ts]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    sets = {d: set(ts) for d, ts in sets.items()}
    for num, den in ((5, 6), (9, 10)):
        got = [
            (r.doc_a, r.doc_b, r.inter, r.sz_a)
            for r in containment_join_over(df, num, den).collect()
        ]
        assert got == _brute(sets, num, den), f"tau={num}/{den}"


def test_planted_asymmetry(spark):
    rows = containment_join(spark, "/root/testdata/sf0.001").collect()
    n_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    )
    # one fragment->host pair per complete triple; never the reverse
    assert len(rows) == (n_docs + 1) // 3 if n_docs % 3 != 2 else n_docs // 3
    assert all(
        r.doc_a % 3 == 1 and r.doc_b == r.doc_a - 1 and r.inter == 12
        for r in rows
    )
