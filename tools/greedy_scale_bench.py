"""Bench + equivalence evidence for the exact-mode sparsifier at volume.

VERDICT r3 #3: ``sparsifier="greedy_exact"`` (the reference's MST +
ascending-weight greedy partitioner, ``special_partition.pyx:288-442``)
was pytest-proven at toy scale only. This harness runs the FLAGSHIP
pipeline twice on the same cached 1M-entity corpus — ``threshold_cc``
(default) vs ``greedy_exact`` — with a synthetic entity set (one anchor
url per gold cluster), and reports for each config:

* wall time + per-stage walls (the greedy overhead is the delta),
* pairwise F1 vs gold on the labeled candidate pairs (equivalence gate:
  both >= 0.99 and |delta| <= 0.005),
* entity-readoff invariant counters from the manifest
  (clusters_wo_entity / clusters_multi_entity),
* predicted component-size distribution (log2 histogram) and the max
  component edge count vs MAX_COMPONENT_EDGES (cap hits == 0 means no
  component was refused — the job completing IS the zero-cap evidence,
  since a hit raises).

Usage: ``python tools/greedy_scale_bench.py [n_entities]`` (default
1_000_000); cores via ``GREEDY_CORES`` (default 16).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

BODY_TOKENS = 150

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.pipeline import PipelineConfig, run_pipeline
from biomedical_entity_linking_spark.operators.clusters import (
    label_candidate_pairs, pairwise_prf,
)
from biomedical_entity_linking_spark.operators.sparsify import (
    MAX_COMPONENT_EDGES,
)

sparsifier = sys.argv[1]; cpus = int(sys.argv[2])
pages_path = sys.argv[3]; gold_path = sys.argv[4]
spark = get_spark(app_name=f"greedy-{sparsifier}", cores=cpus)
pages = spark.read.parquet(pages_path)
gold = spark.read.parquet(gold_path)
n = pages.count()
# synthetic entity set: one anchor url per gold cluster (deterministic min)
entities = gold.groupBy("cluster_id").agg(F.min("url").alias("url")).select("url")
wd = f"/dev/shm/spark_linkage_scaling/greedy_{sparsifier}_{os.getpid()}"
t0 = time.time()
out = run_pipeline(
    spark, pages, PipelineConfig(work_dir=wd, sparsifier=sparsifier),
    entity_urls=entities,
)
nc = out["clusters"].count()
dt = time.time() - t0
# --- untimed evidence section ---
m = pairwise_prf(label_candidate_pairs(out["pairs"], gold, out["clusters"]))
sizes = out["clusters"].groupBy("component").count()
hist = {
    str(r["b"]): r["n"]
    for r in sizes.select(
        F.floor(F.log2(F.col("count"))).alias("b")
    ).groupBy("b").agg(F.count("*").alias("n")).collect()
}
max_size = sizes.agg(F.max("count")).first()[0]
counters = out["counters"]
walls = {s: c.get("wall_sec") for s, c in counters.items()
         if isinstance(c, dict) and c.get("wall_sec") is not None}
inv = counters.get("clusters", {}).get("entity_invariants")
shutil.rmtree(wd, ignore_errors=True)
print(json.dumps({
    "sparsifier": sparsifier, "cpus": cpus, "pages": n, "clusters": nc,
    "sec": round(dt, 2), "docs_per_sec": round(n / dt, 2),
    "f1": m["f1"], "precision": m["precision"], "recall": m["recall"],
    "n_labeled_pairs": m["n_pairs"],
    "component_size_log2_hist": hist, "max_component_size": max_size,
    "max_component_edges_cap": MAX_COMPONENT_EDGES, "cap_hits": 0,
    "stage_walls": walls, "entity_invariants": inv,
}))
"""


def _gen(n_entities: int) -> tuple[str, str]:
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.session import get_spark

    root = "/tmp/spark_linkage_scaling"
    pages_path = f"{root}/pages_{n_entities}_b{BODY_TOKENS}_seed42"
    gold_path = f"{root}/gold_{n_entities}_b{BODY_TOKENS}_seed42"
    if not (os.path.exists(pages_path + "._OK")
            and os.path.exists(gold_path + "._OK")):
        spark = get_spark(app_name="greedy-gen", cores=32)
        pages, gold = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=BODY_TOKENS, partitions=128
        )
        if not os.path.exists(pages_path + "._OK"):
            pages.write.mode("overwrite").parquet(pages_path)
            open(pages_path + "._OK", "w").write("ok")
        gold.write.mode("overwrite").parquet(gold_path)
        open(gold_path + "._OK", "w").write("ok")
        spark.stop()
    return pages_path, gold_path


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("GREEDY_CORES", "16"))
    os.makedirs("/tmp/spark_linkage_scaling", exist_ok=True)
    pages_path, gold_path = _gen(n_entities)
    env = dict(os.environ, SPARK_LINKAGE_TMPFS="1")
    results = {}
    for sparsifier in ("threshold_cc", "greedy_exact"):
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, sparsifier, str(cpus),
             pages_path, gold_path],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(f"child {sparsifier} failed:\n"
                  + "\n".join(proc.stderr.splitlines()[-25:]))
            raise SystemExit(1)
        results[sparsifier] = json.loads(lines[-1])
        print(json.dumps(results[sparsifier]), flush=True)

    a, b = results["threshold_cc"], results["greedy_exact"]
    delta_f1 = abs(a["f1"] - b["f1"])
    verdict = {
        "probe": "greedy_exact_vs_threshold_cc",
        "n_entities": n_entities, "cpus": cpus,
        "threshold_cc_sec": a["sec"], "greedy_exact_sec": b["sec"],
        "greedy_overhead_pct": round(100 * (b["sec"] / a["sec"] - 1), 1),
        "f1_threshold_cc": a["f1"], "f1_greedy_exact": b["f1"],
        "delta_f1": round(delta_f1, 6),
        "equivalence_pass": bool(
            a["f1"] >= 0.99 and b["f1"] >= 0.99 and delta_f1 <= 0.005
        ),
        "cap_hits": b["cap_hits"],
    }
    print(json.dumps(verdict))
    if not verdict["equivalence_pass"]:
        raise SystemExit("equivalence gate FAILED")


if __name__ == "__main__":
    main()
