"""triangle_count vs a brute-force set oracle; blocking_quality
invariants + hand-computed fixture."""

import itertools

import duckdb
import pandas as pd
import pytest

from biomedical_entity_linking_spark.operators import er_quality as EQ
from biomedical_entity_linking_spark.operators import linkgraph as LG

SF = "/root/testdata/sf0.001"


def _brute_triangles(n_docs: int) -> dict[int, int]:
    """Python reimplementation: same link generator, set-based counting."""
    adj: dict[int, set[int]] = {}
    for d in range(n_docs):
        for dst in ((d * d + 1) % n_docs, (7 * d + 3) % n_docs, (d % 97) % n_docs):
            if dst != d:
                adj.setdefault(d, set()).add(dst)
                adj.setdefault(dst, set()).add(d)
    per_node: dict[int, int] = {}
    for a in adj:
        for b, c in itertools.combinations(sorted(adj[a]), 2):
            if b > a and c > a and c in adj.get(b, ()):  # count each once at min node
                for v in (a, b, c):
                    per_node[v] = per_node.get(v, 0) + 1
    return per_node


def test_triangle_count_matches_brute_force(spark):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    got = {
        r["doc_id"]: r["tri_cnt"]
        for r in LG.triangle_count(spark, SF).collect()
    }
    want = _brute_triangles(n_docs)
    assert got == want
    assert sum(got.values()) % 3 == 0  # every triangle contributes 3 corners


def test_triangle_count_oracle_parity(spark):
    sdf = (
        LG.triangle_count(spark, SF)
        .toPandas()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    odf = (
        con.execute(LG.TRIANGLE_COUNT_SQL)
        .df()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sdf.astype("int64"), odf.astype("int64"), check_dtype=False
    )


@pytest.fixture(scope="module")
def bq(spark):
    return EQ.blocking_quality(spark, SF).toPandas().set_index("scheme_bits")


def test_blocking_quality_invariants(bq):
    assert list(bq.index) == [8, 6, 4]
    for bits, row in bq.iterrows():
        assert 0 <= row.true_cand_pairs <= min(row.cand_pairs, row.gold_pairs)
        assert row.cand_pairs <= row.total_pairs
        assert 0 <= row.completeness_ppm <= 1_000_000
        assert 0 <= row.quality_ppm <= 1_000_000
    # coarser blocks can only merge cells: candidate sets are NESTED, so
    # cand/true_cand counts and completeness are monotone non-decreasing
    # as bits decrease, and reduction ratio monotone non-increasing
    for hi, lo in ((8, 6), (6, 4)):
        assert bq.loc[lo].cand_pairs >= bq.loc[hi].cand_pairs
        assert bq.loc[lo].true_cand_pairs >= bq.loc[hi].true_cand_pairs
        assert bq.loc[lo].completeness_ppm >= bq.loc[hi].completeness_ppm
        assert bq.loc[lo].reduction_ratio_ppm <= bq.loc[hi].reduction_ratio_ppm
    # gold pairs are scheme-independent
    assert bq.gold_pairs.nunique() == 1


def test_blocking_quality_counts_vs_pairwise(spark, bq):
    """Re-derive the 8-bit row by materializing actual pairs (feasible at
    sf0.001) — certifies the c·(c−1)/2 identity against ground truth."""
    import itertools as it

    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    def cell(e):
        return sum((1 << (7 - i)) for i in range(8) if e[i] > 0)

    items = [(r.vec_id, r.label, cell(r.embedding)) for r in rows]
    cand = gold = true = 0
    for (i1, l1, c1), (i2, l2, c2) in it.combinations(items, 2):
        cand += c1 == c2
        gold += l1 == l2
        true += (c1 == c2) and (l1 == l2)
    row = bq.loc[8]
    assert (row.cand_pairs, row.gold_pairs, row.true_cand_pairs) == (
        cand, gold, true,
    )


def test_bcubed_matches_brute_force(spark):
    """Pure-Python B-cubed over collected rows == the distributed op."""
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .collect()
    )

    def cell(e):
        code = sum((1 << (7 - i)) for i in range(8) if e[i] > 0)
        return code >> 4  # _BCUBED_BITS = 4

    items = [(r.vec_id, r.label, cell(r.embedding)) for r in rows]
    from collections import Counter

    csz = Counter(c for _, _, c in items)
    gsz = Counter(l for _, l, _ in items)
    osz = Counter((c, l) for _, l, c in items)
    p = sum(osz[(c, l)] * 1_000_000 // csz[c] for _, l, c in items)
    r = sum(osz[(c, l)] * 1_000_000 // gsz[l] for _, l, c in items)
    n = len(items)
    p_ppm, r_ppm = p // n, r // n
    want = {
        "n_items": n,
        "bcubed_precision_ppm": p_ppm,
        "bcubed_recall_ppm": r_ppm,
        "bcubed_f1_ppm": 2 * p_ppm * r_ppm // (p_ppm + r_ppm),
    }
    got = EQ.bcubed_quality(spark, SF).collect()[0].asDict()
    assert got == want
    # sanity: ppm scores live in [0, 1e6] and a perfect clustering bound
    assert 0 < got["bcubed_f1_ppm"] <= 1_000_000
