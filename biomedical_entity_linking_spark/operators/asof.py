"""As-of (most-recent-prior) join — the temporal join Spark doesn't ship.

Attribution is the canonical form: join every purchase to the SAME
user's most recent click at-or-before the purchase timestamp. A naive
relational form is a range self-join (every purchase × every earlier
click, then argmax) — quadratic in events-per-user and a skew bomb at
crawl scale. The distributed-native form implemented here is the
union + last-value-carry-forward window:

1. tag both event streams and union them into ONE relation;
2. one shuffle, keyed by user, ordered by (ts, is_purchase, event_id)
   — clicks sort BEFORE purchases at equal ts, so the join is
   INCLUSIVE (click.ts <= purchase.ts), and event_id makes tie order
   deterministic (greatest click id wins among identical timestamps);
3. ``last(click_id, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING ..
   CURRENT ROW)`` carries the latest click forward;
4. keep purchase rows: each holds its attributed click (NULL when no
   prior click — a LEFT as-of).

Cost: ONE shuffle + per-partition sort over clicks+purchases — linear,
skew-bounded by the busiest user (saltable only if a key needs split
mid-sequence, which as-of semantics forbid; the real lever at scale is
time-bucketing the window state, which this unrolled form gets for
free from range partitioning). The gap column is an exact integer
microsecond difference.

The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics from a different engine family —
so the value-hash certifies the union-window construction against a
purpose-built temporal join, not against a mirrored re-spelling.
(Timestamps are unique per (user_id, ts) in the corpus; the
deterministic event_id tie order makes the Spark side well-defined
regardless.)

Reference analog: the reference orders mentions within documents and
picks nearest-prior context rows (``bioel`` span/context slicing);
this is the same "latest earlier row" primitive promoted to a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def click_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → one row per purchase with its attributed prior click.

    Output: (purchase_id, user_id, purchase_ts, click_id nullable,
    gap_us nullable) — gap_us = microseconds from click to purchase.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"),
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.col("is_purchase").asc(),
            F.col("click_id").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "user_id",
        "ts",
        "is_purchase",
        "purchase_id",
        F.last("click_id", ignorenulls=True).over(w).alias("attr_click_id"),
        F.last(
            F.when(F.col("click_id").isNotNull(), F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("attr_click_ts"),
    )
    return (
        carried.filter(F.col("is_purchase") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("attr_click_id").alias("click_id"),
            # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not)
            F.expr("timestampdiff(MICROSECOND, attr_click_ts, ts)").alias(
                "gap_us"
            ),
        )
        .orderBy("purchase_id")
    )


CLICK_ATTRIBUTION_ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_id
  FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.click_id,
       date_diff('microsecond', c.ts, p.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""
