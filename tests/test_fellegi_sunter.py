"""Fellegi–Sunter EM: integer-recurrence invariants, separation on a
structured pattern set, and cross-engine parity at sf0.001."""

import duckdb
import pytest

from biomedical_entity_linking_spark.operators import fellegi_sunter as FS

SF = "/root/testdata/sf0.001"
S = FS.SCALE


def test_em_separates_structured_patterns():
    # 2 classes planted by construction: 100 pairs agreeing on all three
    # fields (matches) and 10_000 pairs agreeing on none (non-matches),
    # plus noise patterns. EM must put the all-agree pattern's posterior
    # near 1, the all-disagree near 0, and learn m_k >> u_k.
    patterns = [
        ((1, 1, 1), 100),
        ((0, 0, 0), 10_000),
        ((1, 0, 0), 50),
        ((0, 1, 0), 50),
    ]
    lam, m, u, rows = FS._em(sorted(patterns))
    resp = {g: r for g, _, r in rows}
    assert resp[(1, 1, 1)] > 9 * S // 10
    assert resp[(0, 0, 0)] < S // 10
    for k in range(FS.N_FIELDS):
        assert m[k] > u[k]
    # prevalence is in the plausible band around 100/10200
    assert 0 < lam < S // 2


def test_em_integer_bounds_and_determinism():
    patterns = [((1, 1, 0), 7), ((0, 0, 0), 93), ((1, 0, 0), 11)]
    out1 = FS._em(sorted(patterns))
    out2 = FS._em(sorted(patterns))
    assert out1 == out2  # exact integer math → bit-identical reruns
    lam, m, u, rows = out1
    for v in [lam, *m, *u]:
        assert 1 <= v <= S - 1
    for _, n, r in rows:
        assert 0 <= r <= S
        assert n > 0


def test_em_degenerate_single_pattern_is_guarded():
    # one pattern → EM collapses toward a clamp, but must never divide
    # by zero or leave the [1, S-1] parameter box
    lam, m, u, rows = FS._em([((1, 1, 1), 5)])
    for v in [lam, *m, *u]:
        assert 1 <= v <= S - 1
    assert len(rows) == 1


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return c


def test_model_parity_sf0001(spark, con):
    got = [tuple(r) for r in FS.fs_em_weights(spark, SF).collect()]
    want = [tuple(r) for r in con.execute(FS.FS_EM_WEIGHTS_SQL).fetchall()]
    assert got == want
    assert len(got) >= 2  # γ_text varies within blocks (NORM_LEN > BLOCK_LEN)


def test_pair_posteriors_parity_and_threshold(spark, con):
    got = [tuple(r) for r in FS.fs_pair_posteriors(spark, SF).collect()]
    want = [
        tuple(r) for r in con.execute(FS.FS_PAIR_POSTERIORS_SQL).fetchall()
    ]
    assert got == want
    for row in got:
        assert row[-1] >= S // 2  # the ≥ 1/2 posterior contract
        assert row[0] < row[1]  # canonical a < b pair order


# ---------------------------------------------------------------------------
# mutual-best handshake matching
# ---------------------------------------------------------------------------


def test_mutual_best_handshake_properties(spark):
    from biomedical_entity_linking_spark.operators.fellegi_sunter import (
        mutual_best_over,
    )

    # chain 1-2-3-4 with weights 9, 5, 9: nodes 2,3 prefer outward
    # partners, so the middle edge must drop; plus a tied star 10-(11,12)
    # where the id tiebreak must pick 11 deterministically
    edges = spark.createDataFrame(
        [
            (1, 2, 9),
            (2, 3, 5),
            (3, 4, 9),
            (10, 11, 7),
            (10, 12, 7),
        ],
        "id_a long, id_b long, w long",
    )
    got = [(r.id_a, r.id_b, r.w) for r in mutual_best_over(edges, "w").collect()]
    assert got == [(1, 2, 9), (3, 4, 9), (10, 11, 7)]
    # 1:1 property: no node appears twice
    nodes = [n for a, b, _ in got for n in (a, b)]
    assert len(nodes) == len(set(nodes))


def test_fs_mutual_match_is_subset_of_candidates(spark):
    from biomedical_entity_linking_spark.operators.fellegi_sunter import (
        _gamma_pairs,
        fs_mutual_match,
    )

    sf = "/root/testdata/sf0.001"
    cand = {
        (r.id_a, r.id_b) for r in _gamma_pairs(spark, sf).collect()
    }
    got = fs_mutual_match(spark, sf).collect()
    assert all((r.id_a, r.id_b) in cand for r in got)
    # 1:1: every doc matched at most once
    nodes = [n for r in got for n in (r.id_a, r.id_b)]
    assert len(nodes) == len(set(nodes))
