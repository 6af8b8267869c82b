"""Two-cluster-size scaling evidence (north rule): run the identical ER
pipeline job on the same cached input at local[N] and local[4N] (standing in
for N and 4N executors — no real cluster in the sandbox), report docs/sec at
both plus scaling efficiency = (T_N / T_4N) / 4.

Default legs are local[4] vs local[16]: on a 32-vCPU single-box sandbox,
local[32] oversubscribes (driver + GC + shuffle threads + 32 Python workers
compete for the same cores and memory bandwidth), which adds 20-30%
run-to-run noise that has nothing to do with the job's scalability. 4 vs 16
keeps both legs unoversubscribed while preserving the 4x ratio. Override
with SCALING_LEGS="8,32".

Each measurement runs in a fresh subprocess (a Spark master is fixed per
JVM). Usage: python tools/scaling_bench.py [n_entities]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, ".")
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.pipeline import PipelineConfig, run_pipeline

cpus = int(sys.argv[1]); pages_path = sys.argv[2]
spark = get_spark(app_name=f"scaling{cpus}", cores=cpus)
pages = spark.read.parquet(pages_path)
n = pages.count()
# warm the JVM + Python UDF worker pool + Arrow codepath so we time
# steady-state execution, not interpreter startup
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

@F.pandas_udf(LongType())
def _warm(s: pd.Series) -> pd.Series:
    return s.str.len().astype("int64")

pages.limit(2000).select(F.sum(_warm(F.col("url")))).collect()
# tmpfs work dir: single-disk bandwidth is a sandbox artifact (cluster
# executors scale disk with cores); shuffle+checkpoint volume fits shm
# comfortably since the pair-volume fixes (~25 GB peak vs 126 GB)
wd = f"/dev/shm/spark_linkage_scaling/run_{cpus}_{os.getpid()}"
t0 = time.time()
out = run_pipeline(spark, pages, PipelineConfig(work_dir=wd))
nc = out["clusters"].count()
dt = time.time() - t0
shutil.rmtree(wd, ignore_errors=True)
walls = {s: c.get("wall_sec") for s, c in out["counters"].items()
         if isinstance(c, dict) and c.get("wall_sec") is not None}
print(json.dumps({"cpus": cpus, "pages": n, "clusters": nc,
                  "sec": round(dt, 2), "docs_per_sec": round(n / dt, 2),
                  "stage_walls": walls}))
"""


BODY_TOKENS = int(os.environ.get("SCALING_BODY_TOKENS", "150"))


def _gen_pages(n_entities: int) -> str:
    import sys

    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.session import get_spark

    path = (
        f"/tmp/spark_linkage_scaling/pages_{n_entities}_b{BODY_TOKENS}_seed42"
    )
    if not os.path.exists(path + "._OK"):
        spark = get_spark(app_name="scaling-gen", cores=32)
        pages, _ = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=BODY_TOKENS, partitions=128
        )
        pages.write.mode("overwrite").parquet(path)
        open(path + "._OK", "w").write("ok")
        spark.stop()
    return path


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    os.makedirs("/tmp/spark_linkage_scaling", exist_ok=True)
    pages_path = _gen_pages(n_entities)

    results = {}
    env = dict(
        os.environ, SPARK_LINKAGE_TMPFS="1", SPARK_DRIVER_MEM="40g"
    )
    legs = tuple(
        int(x) for x in os.environ.get("SCALING_LEGS", "4,16").split(",")
    )
    # best-of-k per leg: the sandbox box is shared — run-to-run tenant noise
    # is ±20-25%, so the min is the least-contended (truest) measurement
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    for cpus in legs:
        best = None
        for t in range(trials):
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, str(cpus), pages_path],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env=env,
            )
            json_lines = [
                l for l in proc.stdout.splitlines() if l.startswith("{")
            ]
            if not json_lines:
                print(f"child cpus={cpus} trial={t} failed; stderr tail:")
                print("\n".join(proc.stderr.splitlines()[-30:]))
                raise SystemExit(1)
            r = json.loads(json_lines[-1])
            print({"trial": t, **r})
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best

    lo, hi = legs
    t_lo, t_hi = results[lo]["sec"], results[hi]["sec"]
    ratio = hi / lo
    eff = (t_lo / t_hi) / ratio
    summary = {
        "pages": results[lo]["pages"],
        f"local{lo}_sec": t_lo,
        f"local{lo}_docs_per_sec": results[lo]["docs_per_sec"],
        f"local{hi}_sec": t_hi,
        f"local{hi}_docs_per_sec": results[hi]["docs_per_sec"],
        f"speedup_{lo}_to_{hi}": round(t_lo / t_hi, 3),
        "parallelism_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
