"""Group linkage core vs a pure-Python roster/Dice/handshake pipeline."""

from collections import defaultdict

from biomedical_entity_linking_spark.operators.grouplink import (
    _GB_OFFSET,
    DICE_MIN_PPM,
    group_linkage,
    group_linkage_over,
)

_PPM = 1_000_000


def _python_group_linkage(rows, dice_min_ppm=DICE_MIN_PPM):
    """rows: (gid, member) with B gids >= _GB_OFFSET → operator output."""
    roster = defaultdict(set)
    for gid, m in rows:
        roster[gid].add(m)
    sz = {g: len(v) for g, v in roster.items()}
    scored = {}
    for ga, ma in roster.items():
        if ga >= _GB_OFFSET:
            continue
        for gb, mb in roster.items():
            if gb < _GB_OFFSET:
                continue
            inter = len(ma & mb)
            if inter and 2 * inter * _PPM >= dice_min_ppm * (
                sz[ga] + sz[gb]
            ):
                scored[(ga, gb)] = (
                    inter,
                    2 * inter * _PPM // (sz[ga] + sz[gb]),
                )
    best = {}
    nodes = {g for p in scored for g in p}
    for u in nodes:
        cands = []
        for (ga, gb), (_, d) in scored.items():
            if ga == u:
                cands.append((-d, gb))
            elif gb == u:
                cands.append((-d, ga))
        best[u] = min(cands)[1]
    out = []
    for (ga, gb), (inter, d) in sorted(scored.items()):
        if best.get(ga) == gb and best.get(gb) == ga:
            out.append(
                (ga, gb - _GB_OFFSET, inter, sz[ga], sz[gb], d)
            )
    return sorted(out)


def test_group_core_adversarial(spark):
    # hand-built: h0 identical; h1 contested by a shared member with
    # h2; h3 below threshold; B-side group with two A suitors
    B = _GB_OFFSET
    rows = [
        (0, 10), (0, 11), (0, 12), (B + 0, 10), (B + 0, 11), (B + 0, 12),
        (1, 20), (1, 21), (1, 99), (B + 1, 20), (B + 1, 21), (B + 1, 98),
        (2, 30), (2, 31), (2, 99), (B + 2, 30), (B + 2, 31), (B + 2, 99),
        (3, 40), (3, 41), (3, 42), (3, 43),
        (B + 3, 40), (B + 3, 77), (B + 3, 78), (B + 3, 79),
    ]
    got = [
        tuple(r)
        for r in group_linkage_over(
            spark.createDataFrame(rows, "gid bigint, member bigint")
        ).collect()
    ]
    want = _python_group_linkage(rows)
    assert got == want
    pairs = {(a, b) for a, b, *_ in got}
    assert (0, 0) in pairs            # identical roster, dice 1.0
    assert (1, 1) in pairs            # own dice 666k beats the 333k
    #                                   cross edge A1-B2 through member 99
    assert (2, 2) in pairs            # B2's best is A2 at dice 1.0
    assert (1, 2) not in pairs        # the cross edge loses the handshake
    assert (3, 3) in pairs            # dice 250000 passes and h3 is
    #                                   uncontested -> trivially mutual
    for a, b, inter, sa, sb, d in got:
        assert d == 2 * inter * _PPM // (sa + sb)


def test_group_linkage_planted(spark):
    sf = "/root/testdata/sf0.001"
    rows = group_linkage(spark, sf).collect()
    n_households = (
        spark.read.parquet(f"{sf}/documents.parquet").count() // 2
    )
    linked = {r.group_a for r in rows}
    for r in rows:
        assert r.group_a == r.group_b  # never a cross-household link
        assert r.dice_ppm >= DICE_MIN_PPM
    # classes 0-2 always link (their own-pair dice >= 600000 dominates
    # every possible roommate edge); class 3 links unless the handshake
    # entangles it with the moved-roommate noise
    for h in range(n_households):
        if h % 4 != 3:
            assert h in linked, f"household {h} (class {h % 4}) unlinked"
    by_class = {}
    for r in rows:
        by_class.setdefault(r.group_a % 4, []).append(r)
    # identical rosters score exactly 1.0 — except h%7 ∈ {1,2}, whose
    # A (resp. B) roster carries the moved-roommate extra member
    assert all(
        r.dice_ppm == _PPM
        for r in by_class[0]
        if r.group_a % 7 not in (1, 2)
    )
    assert all(
        r.dice_ppm < _PPM
        for r in by_class[0]
        if r.group_a % 7 in (1, 2)
    )
    assert all(r.dice_ppm < _PPM for r in by_class[1])   # one left
    assert all(r.matched == 1 for r in by_class.get(3, []))  # dissolved
