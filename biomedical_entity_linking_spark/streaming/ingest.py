"""Incremental ingestion of pages via Structured Streaming.

The reference is batch-only (SURVEY §2.11: no watermarks, no event-time
windows, no stateful operators anywhere in
``davidkartchner/biomedical-entity-linking``), and the ER pipeline is
deliberately batch-with-checkpoints. What a Common-Crawl-scale deployment
does need is *incremental arrival*: new WARC drops land continuously and
must flow into the lakehouse without reprocessing history. This module is
that bridge:

* ``stream_pages`` — a file-source stream over the pages schema (new
  parquet drops under a directory), with ``maxFilesPerTrigger`` back-
  pressure. ``Trigger.AvailableNow`` gives deterministic catch-up batches.
* ``ingest_to_table`` — ``foreachBatch`` writer: each micro-batch passes
  through the same extract stage the batch pipeline uses, then appends to
  the checkpointed records table. Exactly-once comes from the streaming
  checkpoint (source offsets) + idempotent per-batch overwrite of the
  batch's own output partition directory.
* ``dedup_recrawls_stream`` — event-time watermark + dropDuplicates on url
  for bounded-state recrawl suppression inside a window (the streaming
  analog of the batch latest-crawl-wins rule in ``extract.run_extract``).
* ``crawl_sessions`` — custom stateful operator via
  ``applyInPandasWithState``: per-domain crawl sessionization (a session =
  a burst of page arrivals from one domain with inter-arrival gaps below
  ``gap_seconds``). State is one (start, end, count) triple per open
  session, expired by event-time timeout once the watermark passes the
  session gap — bounded state, late data handled by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract import run_extract

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """Streaming DataFrame over a directory that receives parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def dedup_recrawls_stream(pages_stream: DataFrame, watermark: str = "30 days") -> DataFrame:
    """Suppress recrawl duplicates of the same url within the watermark
    horizon: keeps the first arrival per url; state for a url expires once
    the watermark passes its first-seen event time (bounded state via
    ``dropDuplicatesWithinWatermark``, so a recrawl with a *different*
    warc_ts inside the horizon is still suppressed — dedup keyed on
    (url, warc_ts) would never catch a recrawl, whose ts always differs)."""
    return pages_stream.withWatermark(
        "warc_ts", watermark
    ).dropDuplicatesWithinWatermark(["url"])


SESSION_OUTPUT_SCHEMA = (
    "domain string, session_start timestamp, session_end timestamp, "
    "n_pages long"
)
_SESSION_STATE_SCHEMA = "start long, end long, n long"  # epoch micros


def crawl_sessions(
    pages_stream: DataFrame,
    gap_seconds: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-domain crawl sessionization — the ``applyInPandasWithState``
    custom stateful operator of this engine.

    A session for a domain is a maximal run of page arrivals whose
    event-time gaps are < ``gap_seconds``; a closed session emits one row
    (domain, session_start, session_end, n_pages). Sessions close via
    EVENT-TIME TIMEOUT: the state for a domain expires when the watermark
    passes ``session_end + gap_seconds`` — so state size is bounded by the
    number of domains active inside the watermark horizon, and late
    arrivals within the horizon extend their session instead of opening a
    spurious one."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..extract import normalized_domain

    stream = (
        pages_stream.withColumn("domain", normalized_domain(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .select("domain", "warc_ts")
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "domain": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us", tz="UTC")],
                    "session_end": [pd.Timestamp(end, unit="us", tz="UTC")],
                    "n_pages": [n],
                }
            )
            return
        ts_min = None
        ts_max = None
        n_new = 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["warc_ts"]).astype("int64") // 1000  # us
            ts_min = int(ts.min()) if ts_min is None else min(ts_min, int(ts.min()))
            ts_max = int(ts.max()) if ts_max is None else max(ts_max, int(ts.max()))
            n_new += len(ts)
        if state.exists:
            start, end, n = state.get
            start = min(start, ts_min)
            end = max(end, ts_max)
            n += n_new
        else:
            start, end, n = ts_min, ts_max, n_new
        state.update((start, end, n))
        # close the session once the watermark passes end + gap
        state.setTimeoutTimestamp((end + gap_us) // 1000)  # millis
        return iter(())

    return stream.groupBy("domain").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def ingest_to_table(
    pages_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    lang_filter: str | None = "eng",
):
    """foreachBatch writer running the batch extract stage per micro-batch.

    Returns the started StreamingQuery (AvailableNow: drains what exists,
    then stops — the deterministic catch-up mode used in tests and cron-
    style incremental jobs)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = run_extract(batch_df, lang_filter).select(
            "url", "warc_ts", "extracted_text", "title", "norm_domain", "norm_title"
        )
        (
            extracted.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(table_dir)
        )

    return (
        pages_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
