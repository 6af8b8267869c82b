"""df-capped tf-idf retrieval: the production lever's two invariants.

1. A cap at/above the max gram df is a no-op — bit-identical output to
   the uncapped (oracle-certified) query.
2. A tight cap only REMOVES candidate pairs reachable solely through
   hot grams: every (query, cand) the capped run returns was scored by
   the uncapped run with cosine >= the capped cosine (capped dots drop
   only non-negative stopword contributions).
"""

from biomedical_entity_linking_spark.operators.tfidf import (
    tfidf_cosine_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (r["query_id"], r["cand_id"]): (r["rank"], r["cos_sim"])
        for r in df.collect()
    }


def test_loose_cap_is_identity(spark):
    base = _rows(tfidf_cosine_topk(spark, SF_DIR))
    capped = _rows(tfidf_cosine_topk(spark, SF_DIR, df_cap=10**9))
    assert capped == base


def test_tight_cap_scores_are_bounded_by_uncapped(spark):
    # uncapped ALL-pair cosines (not just top-5) for containment checks:
    # rebuild with a huge topk by reading the full cos relation via a
    # loose cap and large rank — simplest: compare against uncapped
    # top-5 where pairs coincide, and check capped cosines never exceed
    # the uncapped cosine for the same pair when both report it.
    base = _rows(tfidf_cosine_topk(spark, SF_DIR))
    capped = _rows(tfidf_cosine_topk(spark, SF_DIR, df_cap=50))
    shared = set(base) & set(capped)
    assert shared, "tight cap should still retrieve overlapping pairs"
    for pair in shared:
        assert capped[pair][1] <= base[pair][1] + 1e-9
