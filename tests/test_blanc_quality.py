"""BLANC operator vs an independent pure-Python pair-counting derivation."""

from collections import Counter

from biomedical_entity_linking_spark.operators.er_quality import (
    blanc_over,
    blanc_quality,
)
from tests.test_ari_quality import _labels

_PPM = 1_000_000


def _pairs(c: Counter) -> int:
    return sum(v * (v - 1) // 2 for v in c.values())


def _f(p: int, r: int) -> int:
    return 2 * p * r // (p + r) if p + r else 0


def _python_blanc(labels):
    n = len(labels)
    t = n * (n - 1) // 2
    p_both = _pairs(Counter(labels))
    p_sys = _pairs(Counter(s for s, _ in labels))
    p_gold = _pairs(Counter(g for _, g in labels))
    rn = t - p_sys - p_gold + p_both
    lp = _PPM * p_both // p_sys if p_sys else 0
    lr = _PPM * p_both // p_gold if p_gold else 0
    np_ = _PPM * rn // (rn + p_gold - p_both) if rn + p_gold - p_both else 0
    nr = _PPM * rn // (rn + p_sys - p_both) if rn + p_sys - p_both else 0
    lf, nf = _f(lp, lr), _f(np_, nr)
    return (
        n, p_sys, p_gold, p_both, str(rn),
        lp, lr, np_, nr, lf, nf, (lf + nf) // 2,
    )


def _row_tuple(row):
    return (
        row.n_items, row.p_sys, row.p_gold, row.p_both, row.rn_pairs,
        row.link_precision_ppm, row.link_recall_ppm,
        row.nonlink_precision_ppm, row.nonlink_recall_ppm,
        row.link_f1_ppm, row.nonlink_f1_ppm, row.blanc_ppm,
    )


def test_blanc_matches_pure_python_on_driver_corpus(spark):
    sf = "/root/testdata/sf0.001"
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = blanc_quality(spark, sf).collect()[0]
    assert _row_tuple(got) == _python_blanc(_labels(ids))
    # both corruption modes must cost on the LINK side; the non-link
    # side stays near-perfect (the apart-mass dominates) — exactly the
    # imbalance BLANC is built to expose
    assert 0 < got.link_f1_ppm < _PPM
    assert got.nonlink_f1_ppm > got.link_f1_ppm
    assert 0 < got.blanc_ppm < _PPM


def test_blanc_core_hand_checked(spark):
    # sys splits gold {a,b,c,d} into 2+2: p_gold = 6, p_sys = 2,
    # p_both = 2 → link P = 1, R = 1/3; t = 6, rn = 0 →
    # non-link P = R = 0 (every apart pair is together in gold)
    labels = [(10, 0), (10, 0), (11, 0), (11, 0)]
    row = blanc_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert _row_tuple(row) == _python_blanc(labels)
    assert row.link_precision_ppm == _PPM
    assert row.link_recall_ppm == _PPM // 3
    assert row.nonlink_f1_ppm == 0
    assert row.blanc_ppm == _f(_PPM, _PPM // 3) // 2


def test_blanc_perfect_agreement_is_million_ppm(spark):
    labels = [(i // 3, i // 3) for i in range(30)]
    row = blanc_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert row.link_f1_ppm == row.nonlink_f1_ppm == _PPM
    assert row.blanc_ppm == _PPM


def test_blanc_all_singletons_guard(spark):
    # no links anywhere: link side 0/0 → 0 by convention, non-link
    # side perfect → BLANC = 0.5 (the degenerate-case convention)
    labels = [(i, i) for i in range(10)]
    row = blanc_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert _row_tuple(row) == _python_blanc(labels)
    assert row.link_f1_ppm == 0
    assert row.nonlink_f1_ppm == _PPM
    assert row.blanc_ppm == _PPM // 2
