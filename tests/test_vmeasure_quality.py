"""V-measure operator vs an independent pure-Python binned derivation."""

from collections import Counter

from biomedical_entity_linking_spark.operators.er_quality import (
    vmeasure_over,
    vmeasure_quality,
)
from tests.test_ari_quality import _labels

_PPM = 1_000_000


def _bits(a: int, b: int) -> int:
    """floor(log2(a/b)) for a >= b >= 1 — the bin-ladder identity."""
    return (a // b).bit_length() - 1


def _python_vmeasure(labels):
    cont = Counter(labels)
    n_sys = Counter(s for s, _ in labels)
    n_gold = Counter(g for _, g in labels)
    n = len(labels)
    hgs = sum(c * _bits(n_sys[s], c) for (s, g), c in cont.items())
    hsg = sum(c * _bits(n_gold[g], c) for (s, g), c in cont.items())
    hg = sum(v * _bits(n, v) for v in n_gold.values())
    hs = sum(v * _bits(n, v) for v in n_sys.values())
    h = _PPM if hg == 0 else _PPM - _PPM * hgs // hg
    c = _PPM if hs == 0 else _PPM - _PPM * hsg // hs
    v = 2 * h * c // (h + c) if h > 0 and c > 0 else 0
    return n, hgs, hg, hsg, hs, h, c, v


def _row_tuple(row):
    return (
        row.n_items, row.hgs_bins, row.hg_bins, row.hsg_bins, row.hs_bins,
        row.homogeneity_ppm, row.completeness_ppm, row.v_ppm,
    )


def test_vmeasure_matches_pure_python_on_driver_corpus(spark):
    sf = "/root/testdata/sf0.001"
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = vmeasure_quality(spark, sf).collect()[0]
    assert _row_tuple(got) == _python_vmeasure(_labels(ids))
    # both corruption modes must cost: over-merge hits homogeneity,
    # over-split hits completeness — neither statistic saturates
    assert 0 < got.homogeneity_ppm < _PPM
    assert 0 < got.completeness_ppm < _PPM
    assert 0 < got.v_ppm < _PPM


def test_vmeasure_core_hand_checked(spark):
    # gold {a,b,c,d} split 2+2 by sys: each cell bits(2//2)=0 → hgs 0
    # (homogeneity perfect), but gold 0's two sys parts cost
    # completeness: hsg = 2*bits(4//2) + 2*bits(4//2) = 4;
    # plus a pure block of 4 (cells bits=0 everywhere)
    labels = (
        [(10, 0), (10, 0), (11, 0), (11, 0)]
        + [(20, 1), (20, 1), (20, 1), (20, 1)]
    )
    row = vmeasure_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    want = _python_vmeasure(labels)
    assert _row_tuple(row) == want
    assert row.homogeneity_ppm == _PPM  # every sys cluster is pure
    # hs: sys sizes {2,2,4} in n=8 → 2*bits(4)+2*bits(4)+4*bits(2) = 12;
    # hsg = 4 → completeness = 1 - 4/12 = 2/3 (integer ppm: 666667)
    assert row.completeness_ppm == _PPM - _PPM * 4 // 12
    # harmonic mean of 1.0 and 2/3 → 0.8
    assert row.v_ppm == 2 * _PPM * 666667 // (_PPM + 666667)


def test_vmeasure_perfect_agreement_is_million_ppm(spark):
    labels = [(i // 3, i // 3) for i in range(30)]
    row = vmeasure_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert row.homogeneity_ppm == row.completeness_ppm == _PPM
    assert row.v_ppm == _PPM


def test_vmeasure_single_gold_cluster_guard(spark):
    # one gold cluster → H(G) = 0 → homogeneity defined as 1;
    # sys splits it in two → completeness pays
    labels = [(i // 2, 0) for i in range(4)]
    row = vmeasure_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert _row_tuple(row) == _python_vmeasure(labels)
    assert row.homogeneity_ppm == _PPM
