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

Usage: ``python tools/cc_scale_bench.py [n_edges_millions] [shape]``
(default 30 chain); legs via ``SCALING_LEGS`` (default "4,16"), trials via
``SCALING_TRIALS``.

Shapes (VERDICT r3 #6 — the chain mix alone doesn't cover the 100x-scale
risks):

* ``chain``  — millions of CHAIN_LEN-node components (barrier-latency
  regime; multiple star rounds, no skew).
* ``giant``  — ONE giant sparse component: a random graph over
  n_edges/2 nodes with average degree 4 (connected w.h.p.), the
  long-convergence case — iterations grow with diameter and every round
  reshuffles nearly all edges.
* ``zipf``   — Zipf-distributed hub components (rank-r component gets
  ~C/r edges, largest ≈ 9% of ALL edges on one hub): the hot-key case —
  star rounds groupBy node id, so the giant hub is a maximally skewed
  reduce key and exercises the AQE skew handling the pipeline relies on.
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
ncomp = labels.select("component").distinct().count()  # untimed: evidence only
print(json.dumps({"cpus": cpus, "edges": n, "labels": nl,
                  "components": ncomp,
                  "iterations": iters, "sec": round(dt, 2),
                  "edges_per_sec": round(n / dt)}))
"""


def _gen_edges(n_edges: int, shape: str = "chain") -> str:
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from biomedical_entity_linking_spark.session import get_spark

    suffix = "" if shape == "chain" else f"_{shape}"
    path = f"/tmp/spark_linkage_scaling/cc_edges_{n_edges}{suffix}"
    if not os.path.exists(path + "._OK"):
        spark = get_spark(app_name="cc-gen", cores=32)
        if shape == "chain":
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
        elif shape == "giant":
            # one giant sparse component: random graph, avg degree 4
            # (n_edges edges over n_edges/2 nodes, connected w.h.p.);
            # deterministic endpoints from xxhash64
            n_nodes = max(n_edges // 2, 2)
            base = spark.range(0, n_edges)
            edges = base.select(
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_nodes)).alias("src"),
                F.pmod(F.xxhash64(F.col("id") + n_edges), F.lit(n_nodes)).alias(
                    "dst"
                ),
            ).filter(F.col("src") != F.col("dst"))
        elif shape == "zipf":
            # Zipf hub components: edge e belongs to rank
            # r(e) = floor(exp(e/C - gamma)) (inverse of the harmonic
            # cumulative C*H(r)), so rank r carries ~C/r edges — the rank-1
            # hub alone holds ~9% of ALL edges: maximal reduce-key skew for
            # the star rounds. C sized for ~1e5 components.
            import math

            c_scale = max(n_edges / math.log(1e5), 1.0)
            base = spark.range(0, n_edges)
            rank = F.greatest(
                F.lit(1),
                F.floor(F.exp(F.col("id") / F.lit(c_scale) - F.lit(0.5772156649))),
            )
            edges = base.select(
                F.xxhash64(F.concat(F.lit("hub"), rank.cast("string"))).alias(
                    "src"
                ),
                F.xxhash64(F.col("id") + 7 * n_edges).alias("dst"),
            )
        else:
            raise SystemExit(f"unknown shape {shape!r}")
        edges.repartition(128).write.mode("overwrite").parquet(path)
        open(path + "._OK", "w").write("ok")
        spark.stop()
    return path


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    shape = sys.argv[2] if len(sys.argv) > 2 else "chain"
    n_edges = n_m * 1_000_000
    os.makedirs("/tmp/spark_linkage_scaling", exist_ok=True)
    edges_path = _gen_edges(n_edges, shape)

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
                "shape": shape,
                "edges": results[lo]["edges"],
                "components": results[lo]["components"],
                f"local{lo}_sec": results[lo]["sec"],
                f"local{hi}_sec": results[hi]["sec"],
                "iterations": results[hi]["iterations"],
                "cc_scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
