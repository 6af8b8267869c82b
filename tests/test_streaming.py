"""Incremental ingestion: AvailableNow catch-up, exactly-once resume."""

import os

from biomedical_entity_linking_spark.data.generator import corpus_to_spark
from biomedical_entity_linking_spark.streaming.ingest import (
    ingest_to_table,
    stream_pages,
)


def _drop(pages_df, drop_dir: str, part: int) -> None:
    pages_df.write.mode("overwrite").parquet(os.path.join(drop_dir, f"drop{part}"))


def test_availablenow_ingest_and_resume(spark, small_corpus, tmp_path):
    pages, _ = corpus_to_spark(spark, small_corpus)
    eng_urls = (
        pages.filter("lang = 'eng'").select("url").distinct().count()
    )
    drop_dir = str(tmp_path / "drops")
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop_dir)

    half_a = pages.filter("url < 'https://m'")
    half_b = pages.filter("url >= 'https://m'")

    # first drop arrives → drain it
    _drop(half_a, os.path.join(drop_dir), 0)
    q = ingest_to_table(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q.awaitTermination(120)
    got_a = spark.read.parquet(table_dir).select("url").distinct().count()
    assert got_a > 0

    # second drop arrives → resume from checkpoint processes ONLY the new
    # files (exactly-once: first drop not re-ingested)
    _drop(half_b, os.path.join(drop_dir), 1)
    q2 = ingest_to_table(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(table_dir)
    assert out.select("url").distinct().count() == eng_urls
    # no url ingested twice with the same warc_ts (would indicate replay)
    assert (
        out.groupBy("url", "warc_ts").count().filter("count > 1").count() == 0
    )
    # extract stage ran inside the stream: normalized columns present
    assert {"norm_domain", "norm_title", "extracted_text"} <= set(out.columns)


def test_dedup_recrawls_suppresses_same_url_later_ts(spark, tmp_path):
    """A recrawl = same url, LATER warc_ts (generator: +7 days). The stream
    dedup must key on url alone within the watermark, else recrawls always
    survive (they never share a warc_ts with the original)."""
    import datetime

    from biomedical_entity_linking_spark.streaming.ingest import (
        dedup_recrawls_stream,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://a.example/x", t0, b"<html>a</html>", "a", "eng"),
        # recrawl of the same url 7 days later, inside the 30-day watermark
        ("https://a.example/x", t0 + datetime.timedelta(days=7), b"<html>a2</html>", "a2", "eng"),
        ("https://b.example/y", t0, b"<html>b</html>", "b", "eng"),
    ]
    src = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    drop_dir = str(tmp_path / "dedup_drops")
    src.coalesce(1).write.parquet(drop_dir)

    deduped = dedup_recrawls_stream(stream_pages(spark, drop_dir))
    out_dir = str(tmp_path / "dedup_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2  # recrawl suppressed
    assert got.filter("url = 'https://a.example/x'").count() == 1
