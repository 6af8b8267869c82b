"""Byte-identity of html → text extraction per url (the input-hint
invariant; reference rule: deterministic passage join,
``bioel/bioel/utils/bigbio_utils.py:109``)."""

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.data.generator import corpus_to_spark
from biomedical_entity_linking_spark.extract import (
    normalized_domain,
    normalized_title,
    run_extract,
)


def test_extraction_byte_identical(spark, small_corpus):
    pages, _ = corpus_to_spark(spark, small_corpus)
    extracted = run_extract(pages, lang_filter=None)
    mismatches = extracted.filter(
        F.col("extracted_text") != F.col("text")
    ).count()
    assert mismatches == 0


def test_utf8_roundtrip(spark):
    """Non-ASCII survives binary → utf-8 → extraction (SURVEY §7(d))."""
    title, body = "café über 中文", "emoji \U0001f600 body"
    html = f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()
    pages = spark.createDataFrame(
        [("https://x.com/a", None, html, title + "\n" + body, "eng")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = run_extract(pages, lang_filter=None).select("extracted_text", "text").collect()[0]
    assert row["extracted_text"] == row["text"]


def test_latest_crawl_wins(spark):
    html_old = b"<html><head><title>old</title></head><body>b</body></html>"
    html_new = b"<html><head><title>new</title></head><body>b</body></html>"
    pages = spark.createDataFrame(
        [
            ("https://x.com/a", "2024-01-01 00:00:00", html_old, "old\nb", "eng"),
            ("https://x.com/a", "2024-02-01 00:00:00", html_new, "new\nb", "eng"),
        ],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = run_extract(pages, lang_filter=None).collect()
    assert len(out) == 1
    assert out[0]["title"] == "new"


def test_lang_filter(spark):
    html = b"<html><head><title>t</title></head><body>b</body></html>"
    pages = spark.createDataFrame(
        [
            ("https://x.com/a", None, html, "t\nb", "eng"),
            ("https://x.com/b", None, html, "t\nb", "deu"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    assert run_extract(pages, lang_filter="eng").count() == 1


def test_normalized_domain(spark):
    df = spark.createDataFrame(
        [
            ("https://www.example.com/x",),
            ("https://m.example.com/y",),
            ("https://amp.example.com:8080/z",),
            ("https://example.com/w",),
        ],
        ["url"],
    ).select(normalized_domain(F.col("url")).alias("d"))
    assert {r["d"] for r in df.collect()} == {"example.com"}


def test_normalized_title(spark):
    df = spark.createDataFrame(
        [("Alpha - BETA; gamma|delta",)], ["t"]
    ).select(normalized_title(F.col("t")).alias("n"))
    assert df.collect()[0]["n"] == "alpha beta gamma delta"
