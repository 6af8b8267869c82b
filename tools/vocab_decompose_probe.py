"""Decompose vocab_topk's runtime at 1M docs into its two components —
the scan+split+explode string path (no shuffle) and phase 1's
repartition-then-count 154M-row hash shuffle — each measured in a fresh
JVM at both legs, so the scaling bottleneck is attributed instead of
guessed (VERDICT r4 #1 follow-through).

Usage: ``python tools/vocab_decompose_probe.py [n_entities]``; legs via
``SCALING_LEGS`` (default "2,8").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
from pyspark.sql import functions as F
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators.text_analysis import (
    VOCAB_CAND,
)

parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
spark = get_spark(app_name=f"vocabdec{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()  # warm scan
toks = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
    F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
)
if which == "string_path":
    df = toks.select(F.xxhash64("token").alias("th"))
elif which == "phase1":
    df = (
        toks.select(F.xxhash64("token").alias("th"))
        .repartition(F.col("th"))
        .groupBy("th")
        .agg(F.count("*").alias("hfreq"))
        .orderBy(F.desc("hfreq"), F.asc("th"))
        .limit(VOCAB_CAND)
        .select("th")
    )
else:
    raise SystemExit(f"unknown component {which}")
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
print(json.dumps({"cpus": cpus, "component": which,
                  "sec": round(time.time() - t0, 2)}))
"""


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    sf_dir = f"/tmp/spark_linkage_scaling/mix_docs_{n_entities}_seed42"
    if not os.path.exists(sf_dir + "._OK"):
        raise SystemExit(
            f"corpus missing at {sf_dir}; run tools/trainmix_scale_bench.py first"
        )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {"probe": "vocab_decompose", "n_entities": n_entities, "legs": legs}
    for comp in ("string_path", "phase1"):
        for cpus in legs:
            r = subprocess.run(
                [sys.executable, "-c", _CHILD, str(cpus), sf_dir, comp],
                capture_output=True, text=True, cwd=root,
            )
            if r.returncode != 0:
                raise SystemExit(
                    f"leg cpus={cpus} comp={comp} failed:\n{r.stderr[-3000:]}"
                )
            row = json.loads(r.stdout.strip().splitlines()[-1])
            print(json.dumps(row), flush=True)
            out[f"{comp}_sec_{cpus}"] = row["sec"]
    lo, hi = legs
    for comp in ("string_path", "phase1"):
        out[f"{comp}_eff"] = round(
            out[f"{comp}_sec_{lo}"] / (out[f"{comp}_sec_{hi}"] * hi / lo), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
