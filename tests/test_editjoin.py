"""Segment-pigeonhole edit-distance join vs brute-force Levenshtein."""

import random

from biomedical_entity_linking_spark.operators import editjoin


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(rows, d):
    out = set()
    for i, (ia, na) in enumerate(rows):
        for ib, nb in rows[i + 1 :]:
            dist = _lev(na, nb)
            if dist <= d:
                out.add((min(ia, ib), max(ia, ib), dist))
    return out


def test_planted_pairs_sf0001(spark):
    got = editjoin.edit_distance_join(spark, "/root/testdata/sf0.001").collect()
    pairs = {(r.doc_a, r.doc_b): r.dist for r in got}
    n_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    )
    # every planted (2m, 2m+1) pair present at distance exactly 1
    for m in range(n_docs // 2):
        assert pairs.get((2 * m, 2 * m + 1)) == 1
    # names verify: no pair the brute force wouldn't accept
    names = {
        r.doc_id: r.name
        for r in editjoin._names(spark, "/root/testdata/sf0.001").collect()
    }
    for (a, b), dist in pairs.items():
        assert _lev(names[a], names[b]) == dist <= editjoin.D


def test_generic_core_matches_brute_force(spark):
    # irregular random strings over a SMALL alphabet (maximally
    # collision-prone segments) at two thresholds, incl. length spread
    rng = random.Random(20260819)
    rows = []
    for i in range(80):
        n = rng.randint(4, 14)
        rows.append((i, "".join(rng.choice("abc") for _ in range(n))))
    # plus planted exact dups and single-op variants
    rows.append((80, rows[0][1]))
    rows.append((81, rows[1][1] + "x"))
    rows.append((82, rows[2][1][1:]))
    df = spark.createDataFrame(rows, "doc_id long, name string")
    for d in (1, 2):
        got = {
            (r.doc_a, r.doc_b, r.dist)
            for r in editjoin.edit_distance_join_over(df, d=d).collect()
        }
        assert got == _brute(rows, d), f"d={d}"
