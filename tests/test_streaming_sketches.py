"""Streaming sketch maintenance: streaming-vs-batch equivalence.

The maintained register table must equal the batch construction over
the same corpus — after the first catch-up run AND after a second drop
resumed from the same checkpoint (incremental state carry)."""

import os

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import sketch as SK
from biomedical_entity_linking_spark.streaming.sketches import (
    maintain_hll_registers,
)
from biomedical_entity_linking_spark.streaming.ingest import stream_pages


def _batch_registers_over(spark, docs_dir):
    return {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in SK.vocab_hll_registers(spark, docs_dir).collect()
    }


def _drop(spark, drop_dir, rows, name):
    spark.createDataFrame(
        [(u, None, None, t, g) for u, t, g in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).write.mode("overwrite").parquet(os.path.join(drop_dir, name))


def test_stream_registers_equal_batch_and_resume(spark, tmp_path):
    drop_dir = str(tmp_path / "drops")
    table_dir = str(tmp_path / "registers")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop_dir)

    rows1 = [
        (f"http://a/{i}", " ".join(f"en{j}" for j in range(i, i + 40)), "en")
        for i in range(0, 400, 40)
    ] + [(f"http://b/{i}", " ".join(f"de{j}" for j in range(i, i + 25)), "de")
         for i in range(0, 100, 25)]
    _drop(spark, drop_dir, rows1, "drop1.parquet")

    q = maintain_hll_registers(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q.awaitTermination()

    got = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in spark.read.parquet(table_dir).collect()
    }
    # batch construction over the same corpus, keyed identically
    batch_docs = str(tmp_path / "batch1")
    spark.read.parquet(drop_dir + "/*").select(
        F.col("lang").alias("source"), "text"
    ).write.parquet(batch_docs + "/documents.parquet")
    assert got == _batch_registers_over(spark, batch_docs)

    # second drop: resume from the SAME checkpoint — state must carry
    rows2 = [
        (f"http://c/{i}", " ".join(f"en{j}" for j in range(i, i + 30)), "en")
        for i in range(500, 620, 30)
    ]
    _drop(spark, drop_dir, rows2, "drop2.parquet")
    q2 = maintain_hll_registers(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q2.awaitTermination()

    got2 = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in spark.read.parquet(table_dir).collect()
    }
    batch_docs2 = str(tmp_path / "batch2")
    spark.read.parquet(drop_dir + "/*").select(
        F.col("lang").alias("source"), "text"
    ).write.parquet(batch_docs2 + "/documents.parquet")
    assert got2 == _batch_registers_over(spark, batch_docs2)
    # and the union genuinely grew the en sketch (new tokens arrived)
    en1 = SK.hll_estimate(
        {b: r for (s, b), r in got.items() if s == "en"}
    )
    en2 = SK.hll_estimate(
        {b: r for (s, b), r in got2.items() if s == "en"}
    )
    assert en2 > en1


def test_cms_stream_registers_equal_batch_and_resume(spark, tmp_path):
    from biomedical_entity_linking_spark.streaming.sketches import (
        maintain_cms_registers,
    )

    drop_dir = str(tmp_path / "cms_drops")
    table_dir = str(tmp_path / "cms_registers")
    ckpt = str(tmp_path / "cms_ckpt")
    os.makedirs(drop_dir)

    rows1 = [
        (f"http://a/{i}",
         " ".join(f"en{j % 50}" for j in range(i, i + 60)), "en")
        for i in range(0, 300, 60)
    ]
    _drop(spark, drop_dir, rows1, "drop1.parquet")
    q = maintain_cms_registers(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q.awaitTermination()

    def batch_cms(docs_dir):
        return {
            (r["source"], r["row"], r["bucket"]): r["cnt"]
            for r in SK.token_cms_registers(spark, docs_dir).collect()
        }

    got = {
        (r["source"], r["row"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(table_dir).collect()
    }
    batch_docs = str(tmp_path / "cms_batch1")
    spark.read.parquet(drop_dir + "/*").select(
        F.col("lang").alias("source"), "text"
    ).write.parquet(batch_docs + "/documents.parquet")
    assert got == batch_cms(batch_docs)

    # resume: counts must ACCUMULATE across drops (sum, not overwrite)
    rows2 = [("http://c/1", " ".join(f"en{j % 50}" for j in range(80)), "en")]
    _drop(spark, drop_dir, rows2, "drop2.parquet")
    q2 = maintain_cms_registers(
        stream_pages(spark, drop_dir + "/*"), table_dir, ckpt
    )
    q2.awaitTermination()
    got2 = {
        (r["source"], r["row"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(table_dir).collect()
    }
    batch_docs2 = str(tmp_path / "cms_batch2")
    spark.read.parquet(drop_dir + "/*").select(
        F.col("lang").alias("source"), "text"
    ).write.parquet(batch_docs2 + "/documents.parquet")
    assert got2 == batch_cms(batch_docs2)
    assert sum(got2.values()) > sum(got.values())
