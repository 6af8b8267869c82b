"""Structural guards for the expression-staging discipline.

Expressions containing higher-order functions evaluate interpreted
(outside whole-stage codegen) with NO common-subexpression elimination,
so a non-cheap expression (regex split, per-token hash transform, vector
norm aggregate) referenced from more than one place — or, worst, from a
lambda BODY — is re-evaluated per reference or per element. Round 4
found and fixed six such sites (repetition_scores was 40× slower than
necessary); these tests pin the fixed shape by counting the expensive
constructions in the OPTIMIZED plan, so a refactor that lets
CollapseProject inline them again (or a new operator that re-introduces
the inline pattern) fails loudly instead of silently burning CPU at
10^12 rows.
"""

import pytest

from biomedical_entity_linking_spark.operators import dedup, text_analysis


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("staging"))
    spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta " * 12) for i in range(50)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _count(plan: str, needle: str) -> int:
    return plan.count(needle)


# (operator, max regex-split occurrences in the optimized plan)
# one split per tokenization; token_stats legitimately carries one split
# plus one BPE regexp_extract_all. The filter-pushdown guard may clone one
# split into a pushed row-filter (cheap, per row not per element).
_TEXT_CASES = [
    ("repetition_scores", 1),
    ("fingerprints", 1),
    ("lang_id", 1),
    ("quality_scores", 1),
    ("token_stats", 1),
]


@pytest.mark.parametrize("name,max_splits", _TEXT_CASES)
def test_text_ops_tokenize_once(spark, docs_dir, name, max_splits):
    df = getattr(text_analysis, name)(spark, docs_dir)
    plan = _optimized(df)
    n = _count(plan, "split(")
    assert n <= max_splits, (
        f"{name}: {n} regex splits in optimized plan (max {max_splits}) — "
        f"the tokenization is being re-evaluated; stage it as a column\n{plan}"
    )


def test_shingle_relation_tokenizes_once_per_branch(spark, docs_dir):
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    plan = _optimized(dedup._shingle_relation(docs))
    # the relation self-joins (df-cap): each of the two branches carries
    # ONE split plus at most one pushed-filter clone
    n = _count(plan, "split(")
    assert n <= 4, f"shingle relation re-tokenizes ({n} splits):\n{plan}"
    # the shingle window lambda must reference the staged column, never an
    # inline split: a lambda-body split would put split( inside lambdafunction
    for line in plan.splitlines():
        if "lambdafunction" in line and "md5" in line:
            assert "split(" not in line, f"split inside shingle lambda:\n{line}"


def test_gram_relation_hashes_tokens_once(spark, docs_dir):
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    plan = _optimized(dedup._gram_occurrences(docs))
    # one split, one token-hash transform — the 8 zip slices must all
    # reference the staged hash column
    assert _count(plan, "split(") <= 2, plan
    n_transform = _count(plan, "transform(")
    assert n_transform <= 2, (
        f"gram relation: {n_transform} transforms in optimized plan — the "
        f"token-hash array is being re-evaluated per zip slice\n{plan}"
    )


def test_score_pairs_norms_stage_per_record(spark):
    from biomedical_entity_linking_spark.operators.scoring import score_pairs

    feats = spark.createDataFrame(
        [(i, f"title {i}", [i % 3 - 1] * 4) for i in range(6)],
        "rid long, norm_title string, embedding array<int>",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "rid_a long, rid_b long"
    )
    plan = _optimized(score_pairs(pairs, feats, prune_threshold=None))
    # exactly one SQRT per feature side, evaluated below the join (in the
    # per-record Projects); an inline cosine denominator would put 2 sqrt
    # (or 4, with the zero-guard) above the join, re-evaluated per pair
    n_sqrt = plan.upper().count("SQRT")
    assert n_sqrt == 2, (
        f"score_pairs: {n_sqrt} sqrt in optimized plan (want 2, one per "
        f"feature side) — norms are being recomputed per pair\n{plan}"
    )
