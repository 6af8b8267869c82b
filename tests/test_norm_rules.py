"""Per-domain normalization rules (abbreviation-dictionary analog,
FIXTURES.md §4; reference ``abbreviations_utils.py:86-121`` +
``bigbio_utils.py:322-341``)."""

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.extract import apply_norm_rules, run_extract


def _records(spark):
    html = lambda t: f"<html><head><title>{t}</title></head><body>b</body></html>".encode()
    pages = spark.createDataFrame(
        [
            ("https://www.ex.com/1", None, html("Intl Widget Co"), "Intl Widget Co\nb", "eng"),
            ("https://ex.com/2", None, html("intl summit"), "intl summit\nb", "eng"),
            ("https://other.net/3", None, html("Intl Gala"), "Intl Gala\nb", "eng"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return run_extract(pages, lang_filter=None)


def test_rules_rewrite_only_matching_domain(spark):
    recs = _records(spark)
    rules = spark.createDataFrame(
        [("ex.com", "intl", "international"), ("ex.com", "co", "company")],
        "domain string, token string, replacement string",
    )
    out = {r["url"]: r["norm_title"] for r in apply_norm_rules(recs, rules).collect()}
    # both www.ex.com and ex.com normalize to domain ex.com → rewritten
    assert out["https://www.ex.com/1"] == "international widget company"
    assert out["https://ex.com/2"] == "international summit"
    # other.net untouched
    assert out["https://other.net/3"] == "intl gala"


def test_empty_rules_is_identity(spark):
    recs = _records(spark)
    rules = spark.createDataFrame(
        [], "domain string, token string, replacement string"
    )
    before = {r["url"]: r["norm_title"] for r in recs.collect()}
    after = {r["url"]: r["norm_title"] for r in apply_norm_rules(recs, rules).collect()}
    assert before == after


def test_token_order_preserved(spark):
    recs = _records(spark)
    rules = spark.createDataFrame(
        [("ex.com", "widget", "gadget")],
        "domain string, token string, replacement string",
    )
    out = {r["url"]: r["norm_title"] for r in apply_norm_rules(recs, rules).collect()}
    assert out["https://www.ex.com/1"] == "intl gadget co"


def test_pipeline_normalize_stage_flows_into_blocking(spark, tmp_path):
    """Rules passed to run_pipeline rewrite norm_title in a checkpointed
    'normalize' stage, with a titles_rewritten counter, and the rewritten
    titles are what blocking sees (the two ex.com variants co-cluster only
    after normalization unifies their titles)."""
    from biomedical_entity_linking_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    html = lambda t: f"<html><head><title>{t}</title></head><body>b</body></html>".encode()
    rows = [
        ("https://www.ex.com/a", None, html("Intl Widget Co Annual Report"),
         "Intl Widget Co Annual Report\nb", "eng"),
        ("https://mirror.ex.com/a", None, html("International Widget Company Annual Report"),
         "International Widget Company Annual Report\nb", "eng"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    rules = spark.createDataFrame(
        [("ex.com", "intl", "international"), ("ex.com", "co", "company"),
         ("mirror.ex.com", "x", "x")],
        "domain string, token string, replacement string",
    )
    out = run_pipeline(
        spark, pages, PipelineConfig(work_dir=str(tmp_path / "wd")), norm_rules=rules
    )
    titles = {r["url"]: r["norm_title"] for r in out["records"].collect()}
    assert titles["https://www.ex.com/a"] == "international widget company annual report"
    assert out["counters"]["normalize"]["titles_rewritten"] == 1
    # blocking consumed the rewritten title: identical titles → co-cluster
    comps = {r["url"]: r["component"] for r in out["clusters"].collect()}
    assert comps["https://www.ex.com/a"] == comps["https://mirror.ex.com/a"]


def test_pipeline_rules_change_invalidates_checkpoint(spark, tmp_path):
    from biomedical_entity_linking_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    html = lambda t: f"<html><head><title>{t}</title></head><body>b</body></html>".encode()
    pages = spark.createDataFrame(
        [("https://ex.com/a", None, html("intl news"), "intl news\nb", "eng")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    wd = str(tmp_path / "wd2")
    r1 = spark.createDataFrame(
        [("ex.com", "intl", "international")],
        "domain string, token string, replacement string",
    )
    out1 = run_pipeline(spark, pages, PipelineConfig(work_dir=wd), norm_rules=r1)
    assert out1["records"].first()["norm_title"] == "international news"
    # different rules → stage fingerprint changes → recompute, not stale read
    r2 = spark.createDataFrame(
        [("ex.com", "intl", "global")],
        "domain string, token string, replacement string",
    )
    out2 = run_pipeline(spark, pages, PipelineConfig(work_dir=wd), norm_rules=r2)
    assert out2["records"].first()["norm_title"] == "global news"


def test_cfg_object_reuse_without_rules_recomputes(spark, tmp_path):
    """Reusing the SAME PipelineConfig object for a later run WITHOUT
    norm_rules must not reuse the normalized checkpoints (run_pipeline
    fingerprints a copy; the caller's cfg is never mutated)."""
    from biomedical_entity_linking_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    html = lambda t: f"<html><head><title>{t}</title></head><body>b</body></html>".encode()
    pages = spark.createDataFrame(
        [("https://ex.com/a", None, html("intl news"), "intl news\nb", "eng")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = PipelineConfig(work_dir=str(tmp_path / "wd3"))
    rules = spark.createDataFrame(
        [("ex.com", "intl", "international")],
        "domain string, token string, replacement string",
    )
    out1 = run_pipeline(spark, pages, cfg, norm_rules=rules)
    assert out1["records"].first()["norm_title"] == "international news"
    # caller's cfg untouched
    assert cfg.norm_rules_fp is None and cfg.vertex_blocklist_fp is None
    # same cfg object, no rules → output is NOT normalized
    out2 = run_pipeline(spark, pages, cfg)
    assert out2["records"].first()["norm_title"] == "intl news"
