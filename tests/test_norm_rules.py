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
