"""Stream-stream interval join == the identical static join, and its
composition with latest-click-per-purchase == the batch as-of operator's
semantics on the same rows."""

import datetime

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.streaming.joins import (
    EVENTS_SCHEMA,
    click_purchase_interval_join,
)

T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _rows():
    m = datetime.timedelta(minutes=1)
    # (event_id, ts, user_id, event_type, value, props)
    return [
        # user 1: two clicks inside the 30 min horizon, one outside
        (1, T0 - 45 * m, 1, "click", 0.0, "{}"),      # outside horizon
        (2, T0 - 20 * m, 1, "click", 0.0, "{}"),      # inside
        (3, T0 - 5 * m, 1, "click", 0.0, "{}"),       # inside, latest
        (4, T0, 1, "purchase", 99.0, "{}"),
        # user 2: click AFTER the purchase — must not attribute
        (5, T0 + 1 * m, 2, "click", 0.0, "{}"),
        (6, T0, 2, "purchase", 10.0, "{}"),
        # user 3: purchase with no clicks at all
        (7, T0, 3, "purchase", 7.0, "{}"),
    ]


def _streams(spark, tmp_path):
    df = spark.createDataFrame(_rows(), EVENTS_SCHEMA)
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    df.filter("event_type = 'click'").coalesce(1).write.parquet(cdir)
    df.filter("event_type = 'purchase'").coalesce(1).write.parquet(pdir)
    rd = lambda d: spark.readStream.schema(EVENTS_SCHEMA).parquet(d)
    return rd(cdir), rd(pdir)


def test_stream_join_equals_static_join(spark, tmp_path):
    clicks, purchases = _streams(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    q = (
        click_purchase_interval_join(clicks, purchases)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    # static reference: same condition on batch frames
    df = spark.createDataFrame(_rows(), EVENTS_SCHEMA)
    c = df.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    p = df.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in c.join(
            p,
            F.expr(
                "c_user = p_user AND click_ts <= purchase_ts"
                " AND click_ts >= purchase_ts - interval 30 minutes"
            ),
        ).collect()
    }
    assert got == want
    assert want == {(4, 2), (4, 3)}  # horizon + direction + no-click cases


def test_latest_click_composition_is_asof(spark, tmp_path):
    """max(click_ts) per purchase over the interval join == the as-of
    rule (most recent prior click within horizon)."""
    clicks, purchases = _streams(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    q = (
        click_purchase_interval_join(clicks, purchases)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    latest = (
        spark.read.parquet(out_dir)
        .groupBy("purchase_id")
        .agg(F.max("click_ts").alias("click_ts"))
        .collect()
    )
    got = {(r.purchase_id, r.click_ts) for r in latest}
    assert got == {(4, T0 - datetime.timedelta(minutes=5))}
