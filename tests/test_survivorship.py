"""survivorship: rule semantics on a hand-built cluster fixture + the
determinism property the built-in mode()/max_by can't give."""

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import survivorship as SV


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n_chars long, lang string, source string, text string"
    )


def test_rules_on_handbuilt_cluster(spark, tmp_path, monkeypatch):
    # one cluster of 4 (same 48-char prefix), one singleton
    base = "x" * SV.NORM_LEN
    rows = [
        (10, 100, "en", "srcA", base + " tail1"),
        (7, 300, "de", "srcB", base + " tail2"),   # longest -> source wins
        (12, 300, "en", "srcC", base + " tail3"),  # same n_chars, higher id
        (9, 50, "en", "srcD", base + " tail4"),
        (99, 10, "zh", "srcZ", "different prefix entirely " + "y" * 30),
    ]
    p = str(tmp_path / "documents.parquet")
    _docs(spark, rows).write.parquet(p)
    out = {
        r.cluster_id: r
        for r in SV.survivorship(spark, str(tmp_path)).collect()
    }
    big = out[7]  # min doc_id of the 4-member cluster
    assert big.n_members == 4
    assert big.best_n_chars == 300
    # modal lang: en (3 of 4)
    assert big.lang == "en"
    # record-carry: winner is (n_chars desc, doc_id asc) -> doc 7 (srcB),
    # not doc 12 despite equal n_chars
    assert big.source == "srcB"
    assert out[99].n_members == 1


def test_mode_tie_breaks_lexicographically(spark, tmp_path):
    base = "t" * SV.NORM_LEN
    rows = [
        (1, 10, "fr", "s1", base),
        (2, 10, "de", "s2", base),  # 1-1 tie: 'de' < 'fr' must win
    ]
    p = str(tmp_path / "documents.parquet")
    _docs(spark, rows).write.parquet(p)
    out = SV.survivorship(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].lang == "de"


def test_total_row_budget(spark):
    """One golden record per distinct normalized prefix — no dup rows,
    no dropped clusters."""
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_clusters = docs.select(
        F.lower(F.substring("text", 1, SV.NORM_LEN))
    ).distinct().count()
    out = SV.survivorship(spark, sf)
    assert out.count() == n_clusters
    assert out.select("cluster_id").distinct().count() == n_clusters
