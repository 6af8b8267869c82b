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
