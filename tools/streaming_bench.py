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

State-scale mode (VERDICT r4 #7 — find the ``applyInPandasWithState``
key-batch knee): ``python tools/streaming_bench.py [n_entities]
--sessions K1,K2,...`` holds the page volume fixed and sweeps the
DOMAIN cardinality by rewriting every url's host to one of K synthetic
domains (``h{xxhash64(url) % K}.x``) before the sessionization stream
runs — pages/sec at each K isolates per-key state overhead from data
volume. Runs ONLY the sessionization probe in this mode.
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

    args = [a for a in sys.argv[1:]]
    session_cards: list[int] | None = None
    if "--sessions" in args:
        i = args.index("--sessions")
        session_cards = [int(x) for x in args[i + 1].split(",")]
        args = args[:i] + args[i + 2 :]
    n_entities = int(args[0]) if args else 30_000
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

    if session_cards is not None:
        from pyspark.sql import functions as F

        out = {"probe": "sessionization_state_scale", "cpus": cpus,
               "pages": n_pages, "legs": []}
        for k in session_cards:
            kd = f"{work}/drops_k{k}"
            if not os.path.exists(kd + "/_OK"):
                # host := one of K synthetic domains; path keeps the url
                # unique so volume and row width stay comparable
                (spark.read.parquet(drops)
                    .withColumn(
                        "url",
                        F.concat(
                            F.lit("https://h"),
                            F.pmod(F.xxhash64("url"), F.lit(k)).cast("string"),
                            F.lit(".x/p/"),
                            F.sha1(F.col("url")),
                        ),
                    )
                    .repartition(16).write.mode("overwrite").parquet(kd))
                with open(kd + "/_OK", "w") as f:
                    f.write("ok")
            n_keys = (spark.read.parquet(kd)
                      .select(F.split_part("url", F.lit("/"), F.lit(3)))
                      .distinct().count())
            ck = f"{work}/ckpt_sess_k{k}"
            shutil.rmtree(ck, ignore_errors=True)
            t0 = time.time()
            q = (
                crawl_sessions(stream_pages(spark, kd + "/*.parquet"))
                .writeStream.format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.time() - t0
            out["legs"].append({
                "domains": k, "distinct_keys": n_keys,
                "sec": round(dt, 2),
                "pages_per_sec": round(n_pages / dt),
            })
            print(json.dumps(out["legs"][-1]), flush=True)
        print(json.dumps(out))
        return

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
