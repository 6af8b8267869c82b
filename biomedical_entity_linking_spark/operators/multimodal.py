"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data lakehouse carries image/audio/video as ``binary``
columns next to text. The decode kernels themselves need codec libraries
that are not in this container, so the *decode step* is stubbed behind a
deterministic fake (or ``NotImplementedError`` for real codecs) — but the
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` iterator signatures, partition-preserving feature
extraction, and metadata projection all behave exactly as they would with a
real decoder dropped in.

Reference analog: the html ``binary`` column of ``pages`` and its
extraction UDF (``extract.py``); the reference's own batched tensor kernels
(``sapbert/model/model_wrapper.py:169-233``) are the vectorized-UDF shape
reused here.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, "
    "width int, height int, duration_ms int"
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes
    with a magic header per kind) for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        body = bytes(rng.randint(0, 256, size=128, dtype=np.uint8))
        payload = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"\x00\x00\x00\x18"}[
            kind
        ] + body
        rows.append(
            (
                i,
                f"https://cdn.example.com/{kind}/{i}",
                kind,
                payload,
                64 + (i % 4) * 32 if kind == "image" else None,
                64 + (i % 3) * 32 if kind == "image" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for the real codec: a deterministic FEATURE_DIM-float feature
    vector derived from the payload bytes. A production deployment replaces
    this body with e.g. PIL/librosa/ffmpeg decode + a feature head; the
    signature (bytes, kind) -> float32[FEATURE_DIM] is the contract."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = blake2b(payload, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """payload binary → feature array<float>, via mapInPandas.

    The iterator form keeps per-partition state (a real decoder would hold
    its codec context here) and streams Arrow batches — payloads never
    materialize as one big driver-side list."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _decode_stub(p, k)]
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        run,
        "media_id long, kind string, feature array<float>, payload_bytes long",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure Catalyst sequence/explode; the actual frame decode is the stub
    above. Demonstrates the explode-then-decode partitioning shape: frames
    of one video stay in one partition until an explicit repartition."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata projection + aggregation (no payload read: Catalyst
    prunes the binary column out of the scan — verify via explain())."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.avg("duration_ms").alias("avg_duration_ms"),
            F.max("width").alias("max_width"),
        )
        .orderBy("kind")
    )


def media_bytes_stats(spark, sf_dir: str) -> DataFrame:
    """Oracle-checked multimodal-column query: treat each document's utf-8
    bytes as an opaque binary payload (the media analog over real testdata),
    tag a deterministic kind, and aggregate typed metadata per kind —
    count, total/max payload bytes. The binary column itself is only
    length-inspected (metadata-style scan); the decode path stays in
    ``extract_features``/``_decode_stub``."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(kind.alias("kind"), F.octet_length(payload).alias("nbytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("nbytes").alias("total_bytes"),
            F.max("nbytes").alias("max_bytes"),
        )
        .orderBy("kind")
    )


MEDIA_BYTES_STATS_SQL = """
SELECT kind,
       count(*) AS n_media,
       CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       max(nbytes) AS max_bytes
FROM (
  SELECT (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
         octet_length(encode(text)) AS nbytes
  FROM documents
)
GROUP BY kind
ORDER BY kind
"""
