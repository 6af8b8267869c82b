"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub."""

import numpy as np
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    media_stats,
    synthesize_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    # deterministic: rerun yields identical features
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for r in rows:
        assert np.allclose(r["feature"], again[r["media_id"]])
    # payload size accounting (plumbing actually saw the bytes)
    assert all(r["payload_bytes"] == 128 + 4 for r in rows)


def test_feature_extraction_null_payload(spark):
    media = synthesize_media(spark, n=6).withColumn(
        "payload", F.when(F.col("media_id") == 0, None).otherwise(F.col("payload"))
    )
    row = (
        extract_features(media).filter(F.col("media_id") == 0).collect()[0]
    )
    assert row["payload_bytes"] == 0
    assert all(x == 0.0 for x in row["feature"])


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=30)
    frames = frame_sample_plan(media, every_ms=1000)
    pdf = frames.toPandas()
    vids = media.filter("kind = 'video'").select("media_id", "duration_ms").collect()
    import math

    expected = sum(math.ceil(v["duration_ms"] / 1000) for v in vids)
    assert len(pdf) == expected
    assert (pdf.frame_ts_ms % 1000 == 0).all()


def test_media_stats_prunes_payload(spark):
    media = synthesize_media(spark, n=30)
    stats = media_stats(media)
    got = {r["kind"]: r["n"] for r in stats.collect()}
    assert got == {"image": 10, "audio": 10, "video": 10}
    # payload column must not appear in the aggregated plan's output schema
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan.split("Aggregate")[0]
