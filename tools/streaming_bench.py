"""Structured-Streaming ingest throughput probe.

The streaming surface (AvailableNow file-source ingest through the batch
extract stage, watermarked recrawl dedup, stateful per-domain
sessionization) is pytest-proven; this probe puts a docs/sec number on it
so BENCH.md covers the incremental-arrival path too: N pages land as
parquet drops across several files, one AvailableNow query drains them
through ``ingest_to_table`` (extract + append), then the recrawl-dedup
and sessionization streams drain the same drops.

Usage: ``python tools/streaming_bench.py [n_entities]`` (default 30_000);
cores via ``SPARK_GRAFT_CPUS`` (default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.session import get_spark
    from biomedical_entity_linking_spark.streaming.ingest import (
        crawl_sessions,
        dedup_recrawls_stream,
        ingest_to_table,
        stream_pages,
    )

    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(app_name="stream-bench", cores=cpus)
    work = f"/tmp/spark_linkage_scaling/stream_bench_{n_entities}"
    drops = f"{work}/drops"
    if not os.path.exists(drops + "/_OK"):
        shutil.rmtree(work, ignore_errors=True)
        pages, _ = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=150, partitions=64
        )
        pages.repartition(16).write.mode("overwrite").parquet(drops)
        with open(drops + "/_OK", "w") as f:
            f.write("ok")
    n_pages = spark.read.parquet(drops).count()

    out = {"probe": "streaming_ingest", "cpus": cpus, "pages": n_pages}

    table, ckpt = f"{work}/table", f"{work}/ckpt"
    shutil.rmtree(table, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    t0 = time.time()
    q = ingest_to_table(stream_pages(spark, drops + "/*.parquet"), table, ckpt)
    q.awaitTermination()
    dt = time.time() - t0
    out["ingest_sec"] = round(dt, 2)
    out["ingest_pages_per_sec"] = round(n_pages / dt)
    out["ingested_rows"] = spark.read.parquet(table).count()

    t0 = time.time()
    q = (
        dedup_recrawls_stream(stream_pages(spark, drops + "/*.parquet"))
        .writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.time() - t0
    out["recrawl_dedup_sec"] = round(dt, 2)
    out["recrawl_pages_per_sec"] = round(n_pages / dt)

    t0 = time.time()
    q = (
        crawl_sessions(stream_pages(spark, drops + "/*.parquet"))
        .writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt_sess")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.time() - t0
    out["sessionize_sec"] = round(dt, 2)
    out["sessionize_pages_per_sec"] = round(n_pages / dt)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
