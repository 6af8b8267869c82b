"""Connected-components scaling evidence at REAL edge volume.

The ER pipeline's clusters stage is the one per-stage number below 0.7 in
the sandbox campaigns — because at ≤1M-entity scale its input (~1M
16-byte edges) is barrier-latency bound: 3 rounds × ~6 sub-second
shuffles, invariant in core count. This harness checks the claim that the
cost amortizes with volume: it generates a deterministic chain-graph edge
set (chains of ``CHAIN_LEN`` nodes — the worst realistic shape, forcing
multiple star rounds) at tens of millions of edges, runs ONLY
``connected_components`` at two parallelism levels in fresh subprocesses,
and reports the efficiency.

Usage: ``python tools/cc_scale_bench.py [n_edges_millions]`` (default 30);
legs via ``SCALING_LEGS`` (default "4,16"), trials via ``SCALING_TRIALS``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHAIN_LEN = 5  # nodes per component → 4 edges, forces ~3 star rounds

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators.connected_components import (
    connected_components,
)

cpus = int(sys.argv[1]); edges_path = sys.argv[2]
spark = get_spark(app_name=f"ccscale{cpus}", cores=cpus)
edges = spark.read.parquet(edges_path)
n = edges.count()  # warms the scan
t0 = time.time()
labels, iters = connected_components(edges, src="src", dst="dst")
nl = labels.count()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "edges": n, "labels": nl,
                  "iterations": iters, "sec": round(dt, 2),
                  "edges_per_sec": round(n / dt)}))
"""


def _gen_edges(n_edges: int) -> str:
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from biomedical_entity_linking_spark.session import get_spark

    path = f"/tmp/spark_linkage_scaling/cc_edges_{n_edges}"
    if not os.path.exists(path + "._OK"):
        spark = get_spark(app_name="cc-gen", cores=32)
        n_comp = n_edges // (CHAIN_LEN - 1)
        base = spark.range(0, n_comp)
        # chain edges with hashed (uniform, uncorrelated) node ids:
        # node(c, i) = xxhash64(c * CHAIN_LEN + i)
        parts = []
        for i in range(CHAIN_LEN - 1):
            parts.append(
                base.select(
                    F.xxhash64(F.col("id") * CHAIN_LEN + i).alias("src"),
                    F.xxhash64(F.col("id") * CHAIN_LEN + i + 1).alias("dst"),
                )
            )
        edges = parts[0]
        for p in parts[1:]:
            edges = edges.unionAll(p)
        edges.repartition(128).write.mode("overwrite").parquet(path)
        open(path + "._OK", "w").write("ok")
        spark.stop()
    return path


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    n_edges = n_m * 1_000_000
    os.makedirs("/tmp/spark_linkage_scaling", exist_ok=True)
    edges_path = _gen_edges(n_edges)

    env = dict(os.environ, SPARK_LINKAGE_TMPFS="1", SPARK_DRIVER_MEM="40g")
    legs = tuple(
        int(x) for x in os.environ.get("SCALING_LEGS", "4,16").split(",")
    )
    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    results = {}
    for cpus in legs:
        best = None
        for t in range(trials):
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD, str(cpus), edges_path],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                env=env,
            )
            lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if not lines:
                print(f"child cpus={cpus} failed:\n" + "\n".join(
                    proc.stderr.splitlines()[-20:]))
                raise SystemExit(1)
            r = json.loads(lines[-1])
            print({"trial": t, **r})
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best

    lo, hi = legs
    eff = (results[lo]["sec"] / results[hi]["sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "edges": results[lo]["edges"],
                f"local{lo}_sec": results[lo]["sec"],
                f"local{hi}_sec": results[hi]["sec"],
                "iterations": results[hi]["iterations"],
                "cc_scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
