"""Stream-stream event-time interval join: click → purchase attribution
on UNBOUNDED inputs.

The batch engine already attributes purchases to their most recent prior
click (``operators/asof.click_attribution_asof``); a live deployment
gets both relations as streams and cannot wait for either to complete.
Structured Streaming's stream-stream inner join with a TIME-INTERVAL
condition is the standard answer, and the state story is the whole
point at scale:

* both sides carry an event-time watermark, and the join condition
  bounds click_ts to ``[purchase_ts − horizon, purchase_ts]``;
* from those two facts Spark derives a state-eviction bound — a click
  row is held in the join state only until the PURCHASE watermark
  passes ``click_ts + horizon``, and a purchase row until the CLICK
  watermark passes its ts — so state is O(arrival rate × horizon),
  never O(stream length). Without the interval bound the click side
  would accumulate forever; that is the difference between a pipeline
  that survives a year of uptime and one that OOMs in a week.

The batch operator remains the semantic oracle: the test drives the
same rows through this stream join and through an identical STATIC
join and asserts row-for-row equality (streaming joins add pairing —
the as-of operator then picks the latest click; composing
``latest-per-purchase`` downstream of this join reproduces it, also
pinned in the test).

Reference analog: none — the reference is batch-only (SURVEY §2.11);
this module exists for the engine's streaming tier alongside
``ingest.crawl_sessions`` (stateful) and ``sketches`` (aggregate
state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint,"
    " event_type string, value double, props string"
)


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(clicks stream, purchases stream) → attributed purchase rows.

    Inner join: purchase p matches click c of the same user with
    ``c.ts ∈ [p.ts − horizon, p.ts]``. Output columns:
    (purchase_id, user_id, purchase_ts, value, click_id, click_ts).
    A purchase with several in-horizon clicks emits one row per click;
    downstream as-of semantics = keep the max click_ts per purchase.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
    )
    joined = c.join(
        p,
        F.expr(
            "c_user = p_user"
            " AND click_ts <= purchase_ts"
            f" AND click_ts >= purchase_ts - interval {horizon}"
        ),
    )
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "value",
        "click_id",
        "click_ts",
    )
