"""prefix_jaccard_join: planted-pair structure, and the generic core's
EXACTNESS (no false negatives/positives) against a pure-Python
brute force over irregular random sets — the property the prefix-filter
theorem guarantees."""

import itertools

import pytest
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import setjoin as SJ

SF = "/root/testdata/sf0.001"


def test_planted_pairs_exact(spark):
    out = SJ.prefix_jaccard_join(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # exactly the (2m, 2m+1) planted pairs, J = 40/42
    want = {(2 * m, 2 * m + 1) for m in range(n_docs // 2)}
    assert {(r.doc_a, r.doc_b) for r in out} == want
    assert all(r.inter == SJ.N_PAIR + SJ.N_HOT for r in out)
    assert all(r.uni == SJ.N_PAIR + SJ.N_HOT + 2 for r in out)


@pytest.mark.parametrize("num,den", [(19, 20), (3, 5), (4, 5)])
def test_core_exactness_vs_brute_force(spark, num, den):
    """Irregular random sets (varied sizes, skewed token frequencies):
    the distributed prefix join returns EXACTLY the brute-force answer."""
    import random

    rng = random.Random(num * 100 + den)
    universe = list(range(60))
    sets = {}
    for d in range(0, 120, 2):
        k = rng.randint(3, 25)
        # skew: low token ids are hot (appear in most sets)
        toks = set(rng.choices(universe[:10], k=3)) | set(
            rng.sample(universe, k)
        )
        sets[d] = toks
        # partner: drop ≤1 element, add ≤1 — guarantees high-J positives
        part = set(toks)
        if len(part) > 3 and rng.random() < 0.7:
            part.discard(rng.choice(sorted(part)))
        if rng.random() < 0.7:
            part.add(rng.choice(universe))
        sets[d + 1] = part
    rows = [(d, t) for d, ts in sets.items() for t in ts]
    toks_df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        (r.doc_a, r.doc_b, r.inter, r.uni)
        for r in SJ.prefix_jaccard_over(toks_df, num, den).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if inter * den >= num * uni:
            want.add((a, b, inter, uni))
    assert got == want
    assert len(want) > 0  # fixture must exercise the positive path


def test_hot_tokens_never_enter_prefixes(spark):
    """The df head (tokens every doc shares) must be pushed out of the
    prefix index — the property that keeps postings lists short at
    scale."""
    toks = SJ._token_sets(spark, SF)
    df_order = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # reconstruct the prefix relation exactly as the operator does
    from pyspark.sql import Window

    ranked = (
        toks.join(df_order, "tok")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("tok").asc()
                )
            ),
        )
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz")
        - F.expr(
            f"(sz * {SJ.TAU_NUM} + {SJ.TAU_DEN} - 1) div {SJ.TAU_DEN}"
        )
        + F.lit(1)
    )
    hot_in_prefix = prefix.filter(F.col("tok") < SJ.N_HOT).count()
    assert hot_in_prefix == 0
    # and every posting list in the index is tiny (df <= 2 by design)
    max_df = (
        prefix.groupBy("tok").agg(F.count("*").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    assert max_df <= 2
