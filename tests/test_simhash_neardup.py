"""Focused test for the r6 value-level simhash banding rewrite
(OPTIMIZATION_r06.md): ``simhash_neardup`` band-joins DISTINCT simhash
VALUES — within-class (hamming 0) doc pairs read off a plain equi-join on
the simhash itself, cross-value candidates hamming-verified one row per
VALUE pair before expanding back to doc pairs. The declared semantics are
unchanged: EVERY doc pair at Hamming distance ≤ 3, so the pin is a
brute-force reference over the computed signatures — complete regardless
of the banding internals (the byte-band pigeonhole covers ≤3 flips of 32
bits across 4 bands). Duplicate classes exercise the within/cross split."""

import itertools

from biomedical_entity_linking_spark.operators.dedup import (
    simhash,
    simhash_neardup,
)

DUP_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
DUP_B = "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3
NEAR_A = DUP_A + "one extra novelty token appended here"


def _write_docs(spark, tmp_path, texts):
    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{path}/documents.parquet")
    return path


def _texts():
    # two duplicate classes (sizes 4 and 3), a near-variant of class A,
    # and unrelated singles — plus an empty doc (filtered before hashing)
    return (
        [DUP_A] * 4
        + [DUP_B] * 3
        + [NEAR_A]
        + [
            "completely different prose about columnar shuffle planning",
            "yet another unrelated document mentioning crater habitats",
            "   ",
        ]
    )


def test_matches_bruteforce_hamming(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, _texts())
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(spark, sf).collect()}
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup(spark, sf).collect()
    ]
    assert len(got) == len(set(got)), "duplicate pair rows emitted"
    assert set(got) == want
    # the duplicate classes alone guarantee C(4,2)+C(3,2) hamming-0 rows
    zeros = {(a, b) for a, b, h in got if h == 0}
    assert {(a, b) for a, b in itertools.combinations(range(4), 2)} <= zeros
    assert {(a, b) for a, b in itertools.combinations((4, 5, 6), 2)} <= zeros


def test_empty_text_docs_never_pair(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, _texts())
    docs_in_pairs = set()
    for r in simhash_neardup(spark, sf).collect():
        docs_in_pairs.add(r["doc_a"])
        docs_in_pairs.add(r["doc_b"])
    assert 10 not in docs_in_pairs  # the whitespace-only doc
