"""Hand-verified feature values for the pair-feature export."""

from pyspark.sql import Row

from biomedical_entity_linking_spark.operators.ml_features import (
    pair_features_over,
)

# two docs sharing a 24-char block prefix, differing afterwards; one
# doc in its own block (must produce NO pair)
_T1 = "alpha beta gamma delta epsilon zeta eta theta"
_T2 = "alpha beta gamma delta epsilon QQQ eta iota kappa"
_T3 = "completely different block prefix here"


def test_hand_built_features(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=_T1, lang="en", source="s0", n_chars=len(_T1)),
            Row(doc_id=2, text=_T2, lang="de", source="s0", n_chars=len(_T2)),
            Row(doc_id=3, text=_T3, lang="en", source="s1", n_chars=len(_T3)),
        ]
    )
    rows = pair_features_over(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.f_exact == 0
    assert r.f_lang == 0  # en vs de
    assert r.f_source == 1
    # 32-char prefixes: "alpha beta gamma delta epsilon z" vs
    # "alpha beta gamma delta epsilon q" — one substitution
    assert r.f_lev32 == 1
    # tokens (both <96 chars, fully kept, lowercased):
    ta = set(_T1.lower().split(" "))
    tb = set(_T2.lower().split(" "))
    assert r.f_tok_inter == len(ta & tb)
    assert r.f_tok_union == len(ta | tb)
    assert r.f_jaccard_ppm == len(ta & tb) * 1_000_000 // len(ta | tb)
    assert r.f_len_diff == abs(len(_T1) - len(_T2))


def test_exact_dup_pair_is_all_agreement(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=7, text=_T1, lang="en", source="s0", n_chars=len(_T1)),
            Row(doc_id=9, text=_T1, lang="en", source="s0", n_chars=len(_T1)),
        ]
    )
    r = pair_features_over(docs).collect()[0]
    assert (r.f_exact, r.f_lang, r.f_source, r.f_lev32) == (1, 1, 1, 0)
    assert r.f_jaccard_ppm == 1_000_000
    assert r.f_len_diff == 0
