"""ARI operator vs an independent pure-Python pair-counting derivation."""

from collections import Counter

from biomedical_entity_linking_spark.operators.er_quality import ari_quality


def _pairs(c: Counter) -> int:
    return sum(v * (v - 1) // 2 for v in c.values())


def _python_ari(labels):
    """(sys, gold) labels → the same integer-ppm statistics."""
    n = len(labels)
    t = n * (n - 1) // 2
    p_both = _pairs(Counter(labels))
    p_sys = _pairs(Counter(s for s, _ in labels))
    p_gold = _pairs(Counter(g for _, g in labels))
    ri_ppm = (t + 2 * p_both - p_sys - p_gold) * 1_000_000 // t
    num = 2 * (t * p_both - p_sys * p_gold)
    den = t * (p_sys + p_gold) - 2 * p_sys * p_gold
    ari_ppm = num * 1_000_000 // den if num >= 0 else -(
        (-num) * 1_000_000 // den
    )
    return n, t, p_sys, p_gold, p_both, ri_ppm, ari_ppm


def _labels(doc_ids):
    out = []
    for d in doc_ids:
        g = d // 4
        if d % 8 == 3:
            s = 1_000_000_000 + d
        elif g % 5 < 2:
            s = g - (g % 5)
        else:
            s = g
        out.append((s, g))
    return out


def test_ari_matches_pure_python(spark):
    sf = "/root/testdata/sf0.001"
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = ari_quality(spark, sf).collect()[0]
    want = _python_ari(_labels(ids))
    assert (
        got.n_items,
        got.t_pairs,
        got.p_sys,
        got.p_gold,
        got.p_both,
        got.ri_ppm,
        got.ari_ppm,
    ) == want
    # the planted corruption must land strictly inside (0, 1):
    # over-merges + over-splits both present
    assert 0 < got.ari_ppm < 1_000_000
    assert got.p_sys > got.p_both < got.p_gold


def test_perfect_agreement_is_million_ppm():
    # identical clusterings → RI = ARI = 1.0 exactly in the pure
    # formula the operator implements
    labels = [(i // 3, i // 3) for i in range(30)]
    n, t, ps, pg, pb, ri, ari = _python_ari(labels)
    assert ri == ari == 1_000_000
