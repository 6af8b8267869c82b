"""Three-mode hit-index semantics vs the reference (evaluate.py:203-231)."""

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.metrics import (
    MISS_SENTINEL,
    hit_basic,
    hit_relaxed,
    hit_strict,
)


def _hits(spark, gold, candidates):
    df = spark.createDataFrame(
        [(gold, candidates)],
        "gold array<string>, candidates array<array<string>>",
    )
    g, c = F.col("gold"), F.col("candidates")
    row = df.select(
        hit_basic(g, c).alias("b"),
        hit_strict(g, c).alias("s"),
        hit_relaxed(g, c).alias("r"),
    ).first()
    return row["b"], row["s"], row["r"]


def _ref_min_hit_index(gold_cuis, candidates, eval_mode):
    """Verbatim reference semantics (evaluate.py:191-231) as the oracle."""
    if candidates == [[]]:
        return MISS_SENTINEL
    if eval_mode == "basic":
        used, flattened = set(), []
        for x in candidates:
            for y in x:
                if y not in used:
                    flattened.append(y)
                    used.add(y)
        for i, c in enumerate(flattened):
            if c in gold_cuis:
                return i
    elif eval_mode == "strict":
        for i, c in enumerate(candidates):
            if all(x in gold_cuis for x in c):
                return i
    elif eval_mode == "relaxed":
        for i, c in enumerate(candidates):
            if any(x in gold_cuis for x in c):
                return i
    return MISS_SENTINEL


CASES = [
    # (gold, candidates)
    (["a"], [["b", "a"], ["c", "d"]]),        # basic hit at flat idx 1
    (["a", "c"], [["b", "d"], ["a", "c"]]),   # strict hit at synset 1
    (["z"], [["b", "a"], ["c", "d"]]),        # all-mode miss
    (["a"], [[]]),                            # [[]] guard → sentinel
    (["a"], [["b"], [], ["a"]]),              # empty synset: strict hits it
                                              # (all([]) is True), basic idx 1
    (["a"], [["a", "a", "b"], ["a"]]),        # dup inside synset: dedup flat
    (["a"], [["b", "c"], ["b", "a"]]),        # relaxed 1, strict miss
]


def test_hit_modes_match_reference(spark):
    for gold, cand in CASES:
        b, s, r = _hits(spark, gold, cand)
        assert b == _ref_min_hit_index(gold, cand, "basic"), (gold, cand)
        assert s == _ref_min_hit_index(gold, cand, "strict"), (gold, cand)
        assert r == _ref_min_hit_index(gold, cand, "relaxed"), (gold, cand)


def test_metric_queries_shape(spark):
    from biomedical_entity_linking_spark.operators.metrics import (
        MAX_K,
        map_at_k,
        precision_at_k,
        recall_modes,
    )

    sf = "/root/testdata/sf0.001"
    rm = recall_modes(spark, sf).toPandas()
    assert set(rm["mode"]) == {"basic", "strict", "relaxed"}
    assert len(rm) == 3 * MAX_K
    # recall is monotone nondecreasing in k within a mode
    for mode, grp in rm.groupby("mode"):
        vals = grp.sort_values("k")["recall_at_k"].tolist()
        assert vals == sorted(vals)
    mp = map_at_k(spark, sf).toPandas()
    pk = precision_at_k(spark, sf).toPandas()
    assert len(mp) == MAX_K and len(pk) == MAX_K
    # precision@k (second variant) = recall_basic@k / k  (evaluate.py:305-320)
    basic = rm[rm["mode"] == "basic"].set_index("k")["recall_at_k"]
    for _, row in pk.iterrows():
        assert abs(row["precision"] - basic[row["k"]] / row["k"]) < 1e-6
