"""MUC operator vs an independent pure-Python missing-link derivation."""

from collections import defaultdict

from biomedical_entity_linking_spark.operators.er_quality import (
    muc_over,
    muc_quality,
)
from tests.test_ari_quality import _labels

_PPM = 1_000_000


def _python_muc(labels):
    """(sys, gold) labels → (n, r_num, r_den, p_num, p_den, R, P, F1)."""
    gold_parts = defaultdict(set)
    gold_size = defaultdict(int)
    sys_parts = defaultdict(set)
    sys_size = defaultdict(int)
    for s, g in labels:
        gold_parts[g].add(s)
        gold_size[g] += 1
        sys_parts[s].add(g)
        sys_size[s] += 1
    r_num = sum(gold_size[g] - len(gold_parts[g]) for g in gold_size)
    r_den = sum(gold_size[g] - 1 for g in gold_size)
    p_num = sum(sys_size[s] - len(sys_parts[s]) for s in sys_size)
    p_den = sum(sys_size[s] - 1 for s in sys_size)
    r = r_num * _PPM // r_den
    p = p_num * _PPM // p_den
    return (
        len(labels), r_num, r_den, p_num, p_den, r, p,
        2 * r * p // (r + p),
    )


def _row_tuple(row):
    return (
        row.n_items, row.r_num, row.r_den, row.p_num, row.p_den,
        row.muc_recall_ppm, row.muc_precision_ppm, row.muc_f1_ppm,
    )


def test_muc_matches_pure_python_on_driver_corpus(spark):
    sf = "/root/testdata/sf0.001"
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = muc_quality(spark, sf).collect()[0]
    assert _row_tuple(got) == _python_muc(_labels(ids))
    # both corruption modes must cost: neither statistic saturates
    assert 0 < got.muc_recall_ppm < _PPM
    assert 0 < got.muc_precision_ppm < _PPM


def test_muc_core_adversarial_shapes(spark):
    # the canonical MUC example (Vilain et al. 1995 fig. 1 flavor):
    # gold {a,b,c,d} vs sys splitting it 2+2 → recall (4-2)/(4-1)=2/3;
    # plus an over-merge: sys lumps gold {e,f} with gold {g,h} →
    # recall stays perfect there but precision pays (4-2)/(4-1);
    # plus singletons that must drop out of BOTH denominators
    labels = (
        [(10, 0), (10, 0), (11, 0), (11, 0)]      # gold 0 split by sys
        + [(20, 1), (20, 1), (20, 2), (20, 2)]    # sys 20 merges gold 1,2
        + [(30, 3), (31, 4)]                       # true singletons
    )
    rows = muc_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()
    assert len(rows) == 1
    assert _row_tuple(rows[0]) == _python_muc(labels)
    # hand-check the closed forms:
    # R: gold 0 (g=4, p=2) → 2/3; gold 1,2 (g=2, p=1) → 1/1 each;
    #    singletons 0/0 → R = (2+1+1)/(3+1+1) = 4/5
    # P: sys 10,11 (s=2, q=1) → 1/1 each; sys 20 (s=4, q=2) → 2/3;
    #    singletons 0/0 → P = (1+1+2)/(1+1+3) = 4/5
    assert rows[0].muc_recall_ppm == 4 * _PPM // 5
    assert rows[0].muc_precision_ppm == 4 * _PPM // 5


def test_muc_perfect_agreement_is_million_ppm(spark):
    labels = [(i // 3, i // 3) for i in range(30)]
    row = muc_over(
        spark.createDataFrame(labels, "sys bigint, gold bigint")
    ).collect()[0]
    assert row.muc_recall_ppm == row.muc_precision_ppm == _PPM
    assert row.muc_f1_ppm == _PPM
