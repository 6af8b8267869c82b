"""Conflict report vs a pure-Python Counter re-derivation."""

from collections import Counter, defaultdict

from biomedical_entity_linking_spark.operators.incremental import NORM_LEN
from biomedical_entity_linking_spark.operators.survivorship import (
    cluster_conflicts,
)


def _python_conflicts(rows):
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.text[:NORM_LEN].lower()].append(r)
    out = []
    for members in clusters.values():
        cid = min(m.doc_id for m in members)
        for attr, get in (
            ("lang", lambda m: m.lang),
            ("n_chars", lambda m: str(m.n_chars)),
            ("source", lambda m: m.source),
        ):
            c = Counter(get(m) for m in members)
            if len(c) < 2:
                continue
            # deterministic mode: count desc, value asc
            top_value, top_count = sorted(
                c.items(), key=lambda kv: (-kv[1], kv[0])
            )[0]
            out.append(
                (
                    cid,
                    attr,
                    len(members),
                    len(c),
                    top_value,
                    top_count,
                    top_count * 1_000_000 // len(members),
                )
            )
    return sorted(out)


def test_matches_pure_python_rederivation(spark):
    sf = "/root/testdata/sf0.001"
    raw = spark.read.parquet(f"{sf}/documents.parquet").collect()
    got = [
        (
            r.cluster_id,
            r.attr,
            r.n_rows,
            r.n_distinct,
            r.top_value,
            r.top_count,
            r.consensus_ppm,
        )
        for r in cluster_conflicts(spark, sf).collect()
    ]
    want = _python_conflicts(raw)
    assert got == want
    # the report must contain ONLY genuine contradictions
    assert all(nd >= 2 for _, _, _, nd, _, _, _ in got)
    # and the corpus must actually exercise it (multi-member clusters
    # with independently-assigned lang/source exist by construction)
    assert len(got) > 0
