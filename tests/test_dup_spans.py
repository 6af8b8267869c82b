"""Exact substring dedup (dup_spans): maximal duplicated token-8-gram
spans over hand-planted documents — span boundary semantics, island
splitting, and the cross-doc-only criterion."""

from biomedical_entity_linking_spark.operators.dedup import (
    DUP_SPAN_W,
    dup_spans,
)

SHARED_A = "b c d e f g h i j k"          # 10 tokens → 3 shared 8-grams
SHARED_B = "m n o p q r s t u v"          # second shared run
UNIQ = " ".join(f"u{i}" for i in range(8))  # 8-token gap splits islands


def _write_docs(spark, tmp_path, texts):
    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(f"{path}/documents.parquet")
    return path


def test_span_boundaries_and_islands(spark, tmp_path):
    texts = [
        f"a {SHARED_A} l",                      # d0: shared run at pos 1..10
        f"x {SHARED_A} y",                      # d1: same run, pos 1..10
        "totally different words with no duplication at all here ok",
        f"{SHARED_A} {UNIQ} {SHARED_B}",        # d3: TWO islands
        f"z {SHARED_B} w",                      # d4: shares only run B
    ]
    sf = _write_docs(spark, tmp_path, texts)
    rows = {
        (r["doc_id"], r["span_start"]): r
        for r in dup_spans(spark, sf).collect()
    }
    # d0/d1: one span each over tokens 1..10 (grams at pos 1,2,3)
    for d in (0, 1):
        r = rows[(d, 1)]
        assert r["span_end"] == 10
        assert r["span_tokens"] == 10
        assert r["n_dup_grams"] == 3
    # d2: clean doc → no rows
    assert not any(d == 2 for d, _ in rows)
    # d3: two separate islands — run A at 0..9, run B at 18..27
    a, b = rows[(3, 0)], rows[(3, 18)]
    assert (a["span_end"], a["n_dup_grams"]) == (9, 3)
    assert (b["span_end"], b["n_dup_grams"]) == (27, 3)
    # d4: only run B, at pos 1..10
    assert rows[(4, 1)]["span_end"] == 10
    assert len(rows) == 5


def test_within_doc_repeat_not_flagged(spark, tmp_path):
    """The criterion is cross-document duplication: a doc repeating its
    own 8-gram twice with no other doc sharing it yields no span."""
    run = "p1 p2 p3 p4 p5 p6 p7 p8"
    sf = _write_docs(spark, tmp_path, [f"{run} gap1 gap2 {run}", "unrelated"])
    assert dup_spans(spark, sf).count() == 0


def test_short_docs_skipped(spark, tmp_path):
    """Docs under W tokens produce no grams and no crash (the
    sequence() boundary guard)."""
    sf = _write_docs(spark, tmp_path, ["one two three", "", "   ", "x y"])
    assert dup_spans(spark, sf).count() == 0
    assert DUP_SPAN_W == 8


def test_contamination_cross_split_only(spark, tmp_path):
    """contamination_hits flags corpus docs sharing an 8-gram with the
    BENCHMARK set only — corpus-internal duplication is not contamination."""
    from biomedical_entity_linking_spark.operators.dedup import (
        contamination_hits,
    )

    bench_run = "q1 q2 q3 q4 q5 q6 q7 q8 q9"      # 9 tokens → 2 grams
    corp_run = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = spark.createDataFrame(
        [
            (0, f"intro {bench_run} outro"),            # benchmark
            (1, f"copied {bench_run} tail"),            # contaminated
            (2, f"{corp_run} filler one two three"),    # corpus-dup only
            (3, f"{corp_run} other words here now"),    # corpus-dup only
            (5, "a perfectly clean document with original text inside"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 0")
    corpus = docs.filter("doc_id <> 0")
    rows = {r["doc_id"]: r for r in contamination_hits(corpus, bench).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_hit_grams"] == 2          # both benchmark grams hit
    assert rows[1]["n_distinct_hit_grams"] == 2
    assert rows[1]["first_hit_pos"] == 1        # after the 'copied' token


def test_repetition_scores_known_fracs(spark, tmp_path):
    from biomedical_entity_linking_spark.operators.text_analysis import (
        repetition_scores,
    )

    sf = _write_docs(
        spark, tmp_path, ["a b a b a b", "w x y z", "solo", ""]
    )
    rows = {r["doc_id"]: r for r in repetition_scores(spark, sf).collect()}
    # "a b a b a b": 2-grams [ab,ba,ab,ba,ab] → 5 total / 2 distinct
    assert rows[0]["dup_2gram_frac"] == 0.6
    # 3-grams [aba,bab,aba,bab] → 4 total / 2 distinct
    assert rows[0]["dup_3gram_frac"] == 0.5
    assert rows[1]["dup_2gram_frac"] == 0.0     # all distinct
    assert rows[2]["n_tokens"] == 1 and rows[2]["dup_2gram_frac"] is None
    assert rows[3]["n_tokens"] == 0 and rows[3]["dup_3gram_frac"] is None
    assert len(rows) == 4                       # one row per doc, always
