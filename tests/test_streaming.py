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


def test_crawl_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: a domain's burst closes once
    the watermark passes session_end + gap; a second burst after the gap is
    a separate session. Two drop files force two micro-batches so the
    watermark advances past the first sessions."""
    import datetime

    from biomedical_entity_linking_spark.streaming.ingest import (
        crawl_sessions,
        stream_pages,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def row(url, minutes):
        return (url, t0 + datetime.timedelta(minutes=minutes),
                b"<html>x</html>", "x", "eng")

    # domain a: burst of 3 within 2 min; domain b: single page
    early = [
        row("https://a.example/1", 0),
        row("https://a.example/2", 1),
        row("https://a.example/3", 2),
        row("https://b.example/1", 0),
    ]
    # far-future page advances the watermark past the early sessions
    late = [row("https://c.example/1", 24 * 60)]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    drop_dir = str(tmp_path / "sess_drops")
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(
        drop_dir + "/d0"
    )
    spark.createDataFrame(late, schema).coalesce(1).write.parquet(
        drop_dir + "/d1"
    )

    sessions = crawl_sessions(
        stream_pages(spark, drop_dir + "/*", max_files_per_trigger=1),
        gap_seconds=600,
        watermark="1 minutes",
    )
    out_dir = str(tmp_path / "sess_out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["domain"]: r
        for r in spark.read.parquet(out_dir).collect()
    }
    # a.example and b.example sessions closed (c.example still open: the
    # watermark never passes its timeout — no row for it)
    assert set(got) == {"a.example", "b.example"}
    a = got["a.example"]
    assert a["n_pages"] == 3
    assert (a["session_end"] - a["session_start"]).total_seconds() == 120
    assert got["b.example"]["n_pages"] == 1
