"""Meta-blocking WNP prune vs a pure-Python re-derivation."""

import random
from collections import Counter, defaultdict

from biomedical_entity_linking_spark.operators.metablocking import (
    metablocking_prune,
    metablocking_prune_over,
)


def _python_wnp(toks, max_df):
    df = Counter(t for _, t in toks)
    postings = defaultdict(list)
    for d, t in toks:
        if 2 <= df[t] <= max_df:
            postings[t].append(d)
    cbs = Counter()
    for docs in postings.values():
        docs = sorted(docs)
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                cbs[(a, b)] += 1
    by_node = defaultdict(list)
    for (a, b), w in cbs.items():
        by_node[a].append(w)
        by_node[b].append(w)
    out = set()
    for (a, b), w in cbs.items():
        for n in (a, b):
            ws = by_node[n]
            if w * len(ws) >= sum(ws):  # w >= node mean, either endpoint
                out.add((a, b, w))
                break
    return sorted(out)


def test_generic_core_matches_python(spark):
    rng = random.Random(20260819)
    toks = set()
    for d in range(60):
        for _ in range(rng.randint(2, 10)):
            toks.add((d, rng.randint(0, 40)))
    toks = sorted(toks)
    df = spark.createDataFrame(toks, "doc_id long, tok long")
    for max_df in (5, 50):
        got = [
            (r.doc_a, r.doc_b, r.cbs)
            for r in metablocking_prune_over(df, max_df).collect()
        ]
        assert got == _python_wnp(toks, max_df), f"max_df={max_df}"


def test_planted_corpus_prunes_to_true_pairs(spark):
    rows = metablocking_prune(spark, "/root/testdata/sf0.001").collect()
    n_docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    )
    # every true pair retained at full CBS, every chain edge pruned,
    # every hot token purged before the join
    assert len(rows) == n_docs // 2
    assert all(
        r.cbs == 20 and r.doc_a % 2 == 0 and r.doc_b == r.doc_a + 1
        for r in rows
    )
