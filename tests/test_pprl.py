"""CLK Bloom linkage core vs a pure-Python encode/band/score pipeline."""

import hashlib

from biomedical_entity_linking_spark.operators.pprl import (
    BF_BITS,
    DICE_MIN_PPM,
    K_HASH,
    N_WORDS,
    clk_linkage,
    clk_linkage_over,
)

_PPM = 1_000_000


def _clk(name):
    """name → list of 8 x 32-bit words, mirroring the md5 double-hash."""
    words = [0] * N_WORDS
    for i in range(len(name) - 1):
        gram = name[i : i + 2]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
        h1, h2 = h % BF_BITS, 1 + (h >> 8) % (BF_BITS - 1)
        for j in range(K_HASH):
            p = (h1 + j * h2) % BF_BITS
            words[p // 32] |= 1 << (p % 32)
    return words


def _python_clk_linkage(names, dice_min_ppm=DICE_MIN_PPM):
    enc = {i: _clk(n) for i, n in names}
    out = []
    ids = sorted(enc)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            wa, wb = enc[a], enc[b]
            if not any(
                wa[k] == wb[k] and wa[k] != 0 for k in range(N_WORDS)
            ):
                continue
            inter = sum(bin(wa[k] & wb[k]).count("1") for k in range(N_WORDS))
            pa = sum(bin(w).count("1") for w in wa)
            pb = sum(bin(w).count("1") for w in wb)
            if 2 * inter * _PPM >= dice_min_ppm * (pa + pb):
                out.append(
                    (a, b, inter, pa, pb, 2 * inter * _PPM // (pa + pb))
                )
    return out


def test_clk_core_matches_python(spark):
    # adversarial small names over a tiny alphabet: heavy gram reuse,
    # identical pairs, one-char edits, and disjoint-alphabet strangers
    names = [
        (0, "abcdefabcdef"),
        (1, "abcdefabcdef"),        # identical -> dice = 1.0 exactly
        (2, "abcdefabcdxf"),        # 1 substitution of 0
        (3, "zzzzyyyyxxxx"),
        (4, "zzzzyyyyxxx"),         # 1 deletion of 3
        (5, "qrstuvqrstuv"),        # unrelated
        (6, "mnopmnopmnop"),        # unrelated
    ]
    got = [
        tuple(r)
        for r in clk_linkage_over(
            spark.createDataFrame(names, "doc_id bigint, name string"),
            dice_min_ppm=700_000,
        ).collect()
    ]
    want = _python_clk_linkage(names, dice_min_ppm=700_000)
    assert got == want
    pairs = {(a, b) for a, b, *_ in got}
    assert (0, 1) in pairs and (3, 4) in pairs
    exact = [r for r in got if (r[0], r[1]) == (0, 1)]
    assert exact[0][5] == _PPM  # identical names -> dice exactly 1.0
    assert not any({a, b} == {5, 6} for a, b, *_ in pairs)


def test_clk_planted_recall_and_precision(spark):
    sf = "/root/testdata/sf0.001"
    rows = clk_linkage(spark, sf).collect()
    n = spark.read.parquet(f"{sf}/documents.parquet").count()
    planted = {(2 * m, 2 * m + 1) for m in range(n // 2)}
    found = {(r.doc_a, r.doc_b) for r in rows}
    # pigeonhole: 1 edit -> <= 3 gram diff -> <= 6 positions < 8 words
    # -> >= 2 untouched words -> every planted pair is a candidate, and
    # a single-char deletion keeps Dice comfortably above 0.8
    assert planted <= found
    assert found == planted  # hex-random strangers never reach 0.8
    for r in rows:
        assert r.dice_ppm >= DICE_MIN_PPM
        assert r.inter_bits <= min(r.pop_a, r.pop_b)
