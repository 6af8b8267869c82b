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
from biomedical_entity_linking_spark.plans.staging_lint import lint


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


# ---------------------------------------------------------------------------
# generic staging lint (plans.staging_lint, VERDICT r4 #8)
# ---------------------------------------------------------------------------

def test_lint_catches_loop_invariant_split(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    # the canonical r4 bug shape: a regex split INSIDE a HOF lambda that
    # ignores the lambda variable — re-tokenizes once per element
    bad = df.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(3)),
            lambda g: F.element_at(F.split("text", r"\s+"), g + 1),
        ).alias("xs")
    )
    findings = lint(bad)
    assert findings and "split" in findings[0], findings


def test_lint_passes_per_element_regex(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["ab", "cd"])], "doc_id long, toks array<string>"
    )
    # per-element regex referencing the lambda variable is legitimate work
    good = df.select(
        F.filter(F.col("toks"), lambda t: t.rlike("^a")).alias("hits"),
        F.transform(
            F.col("toks"), lambda t: F.regexp_replace(t, "a", "_")
        ).alias("red"),
    )
    assert lint(good) == []


def test_lint_sees_through_nested_lambda_scopes(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [["a"], ["b"]])], "doc_id long, xss array<array<string>>"
    )
    # an inner HOF whose input depends on the OUTER lambda variable is
    # loop-dependent at depth 2 — must not be flagged
    good = df.select(
        F.transform(
            F.col("xss"),
            lambda xs: F.filter(xs, lambda x: x.rlike("^a")),
        ).alias("out")
    )
    assert lint(good) == []


def test_lint_clean_on_fixed_operators(spark, docs_dir):
    # the staged operators must stay lint-clean (regression guard for the
    # r4 fixes and the r5 metrics synset restructure)
    for name in ("repetition_scores", "fingerprints", "lang_id",
                 "quality_scores", "token_stats"):
        assert lint(getattr(text_analysis, name)(spark, docs_dir)) == [], name
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    assert lint(dedup._gram_occurrences(docs)) == []


def test_lint_clean_on_candidate_relation(spark, tmp_path):
    import numpy as np
    from biomedical_entity_linking_spark.operators.metrics import (
        candidate_relation,
    )

    rng = np.random.default_rng(3)
    rows = [
        (i, int(i % 4), [float(x) for x in rng.normal(size=8)])
        for i in range(24)
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    # r5 regression: the synset builder held an O(k) transform inside the
    # per-group lambda (CollapseProject re-inlined the staged column)
    assert lint(candidate_relation(spark, d)) == []
