"""K-core operator vs an independent pure-Python peeler, plus the
structural depth-bound invariant the unrolled oracle depends on."""

import pytest

from biomedical_entity_linking_spark.operators.kcore import (
    K_CORE,
    N_ROUNDS,
    kcore_decomposition,
)


def _build_edges(n):
    core_docs = [d for d in range(n) if d % 16 < 6]
    m = len(core_docs)
    idx_of = {d: j for j, d in enumerate(core_docs)}

    def core_doc(j):
        return (j // 6) * 16 + (j % 6)

    edges = set()

    def add(a, b):
        if a != b and 0 <= a < n and 0 <= b < n:
            edges.add((min(a, b), max(a, b)))

    for d in range(n):
        if d % 16 < 6:
            j = idx_of[d]
            add(d, core_doc((j + 1) % m))
            add(d, core_doc((j + 5) % m))
        else:
            idx = d % 16 - 6
            c, p, g = idx // 5, idx % 5, d // 16
            if p <= 3:
                add(d, g * 16 + 6 + c * 5 + (p + 1))
                add(d, g * 16 + 6 + (1 - c) * 5 + (p + 1))
            if p == 0:
                add(d, core_doc((2 * g + c) % m))
    return edges


def _python_peel(n):
    """→ (rows {doc: (peel_round, core_deg)}, rounds-to-fixpoint)."""
    edges = _build_edges(n)
    alive = set(range(n))
    out = {}
    rounds = 0
    while True:
        deg = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        drop = {v for v in alive if deg.get(v, 0) < K_CORE}
        rounds += 1
        if not drop:
            for v in alive:
                out[v] = (0, deg.get(v, 0))
            return out, rounds
        for v in drop:
            out[v] = (rounds, 0)
        alive -= drop


@pytest.mark.parametrize("n", [50, 499, 500, 4986, 4987])
def test_structural_depth_bound(n):
    # the unrolled oracle is only sound if the generator's peel depth
    # never exceeds N_ROUNDS — the module doc's structural claim
    _, rounds = _python_peel(n)
    assert rounds <= N_ROUNDS


def test_kcore_matches_pure_python(spark):
    sf = "/root/testdata/sf0.001"
    n = spark.read.parquet(f"{sf}/documents.parquet").count()
    want, rounds = _python_peel(n)
    assert rounds <= N_ROUNDS
    got = {
        r.doc_id: (r.peel_round, r.core_deg)
        for r in kcore_decomposition(spark, sf).collect()
    }
    assert got == want
    # the onion must actually have layers: every chain position peels
    # in its own round, and the core survives with degree >= K
    by_round = {}
    for _, (pr, _cd) in got.items():
        by_round[pr] = by_round.get(pr, 0) + 1
    assert sorted(by_round) == [0, 1, 2, 3, 4, 5]
    assert all(cd >= K_CORE for pr, cd in got.values() if pr == 0)


def test_kcore_output_is_total_and_disjoint(spark):
    sf = "/root/testdata/sf0.001"
    rows = kcore_decomposition(spark, sf).collect()
    n = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(rows) == n == len({r.doc_id for r in rows})
    for r in rows:
        assert (r.peel_round == 0) == (r.core_deg > 0)
