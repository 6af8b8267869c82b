"""Standalone scaling probe for the corpus-dedup operator family
(round 4): ``dup_spans`` (exact substring dedup — the heaviest new
operator: posexplode grams → min/max groupBy → flag-back join → island
window) and ``decontamination`` (broadcast benchmark-gram semi-join) over
a large deterministic documents table, timed at two parallelism levels in
fresh subprocesses — the same N vs 4N evidence pattern as
``scaling_bench.py`` / ``cc_scale_bench.py``.

The documents table derives from the distributed pages generator (pages
of one entity share phrasing → real duplicated 8-gram runs; the Zipf
long-tail vocabulary keeps cross-entity grams mostly unique, like a web
corpus). Input is materialized once as parquet and shared by both legs,
so the timed section is pure operator.

Usage: ``python tools/dedup_scale_bench.py [n_entities]`` (default
300_000 ≈ 1M docs); legs via ``SCALING_LEGS`` (default "2,8"), trials
via ``SCALING_TRIALS`` (default 2). Each (op, leg) runs in its OWN
subprocess with heap scaled per-core (``DEDUP_BENCH_GB_PER_CORE``,
default 6g/core) — the r4 campaigns proved both shared-state artifacts:
a fixed 48g heap slowed the 2-core leg 33% (GC threads scale with
cores), and the second op in a shared JVM inherited the first's
heap/spill state (superlinear decon readings in both runs).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators.dedup import (
    dup_spans, contamination_hits,
)

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
# shuffle partitions sized to the DATA (≈150M gram rows → ~64 partitions
# of ~50 MB), identical on both legs: parallelism comes from cores, and
# the low leg must not spill just because it has fewer of them
parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
# cluster-faithful memory: an executor's heap travels with its cores, so
# the leg's JVM gets gb-per-core x cores (default 6g/core: 12g at 2,
# 48g at 8) — a fixed heap on both legs measures one box's GC behavior,
# not the plan (the r4 1M-doc campaign's superlinear-decon artifact)
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
spark = get_spark(app_name=f"dedupscale{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = docs.count()  # warm scan
out = {"cpus": cpus, "docs": n, "op": which}
# one op per process: the second op in a shared JVM inherits the first
# op's heap/spill state (both r4 1M campaigns read decon superlinear for
# exactly that reason) — per-(op, leg) isolation makes numbers attributable
if which == "dup_spans":
    t0 = time.time()
    out["dup_spans_rows"] = dup_spans(spark, sf_dir).count()
    out["dup_spans_sec"] = round(time.time() - t0, 2)
else:
    # production decontamination shape: the benchmark is FIXED AND SMALL
    # (eval suites are megabytes) while the corpus grows — the % 10 demo
    # split would scale the broadcast side with the corpus instead
    bench = docs.orderBy("doc_id").limit(1000)
    corpus = docs.join(F.broadcast(bench.select("doc_id")), "doc_id", "left_anti")
    t0 = time.time()
    out["decontamination_rows"] = contamination_hits(corpus, bench).count()
    out["decontamination_sec"] = round(time.time() - t0, 2)
print(json.dumps(out))
"""


def _gen_docs(n_entities: int) -> str:
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.session import get_spark

    path = f"/tmp/spark_linkage_scaling/dedup_docs_{n_entities}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        spark = get_spark(app_name="dedup-gen", cores=32)
        pages, _ = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=150, partitions=128
        )
        pages.select(
            F.xxhash64("url").alias("doc_id"), F.col("text")
        ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _run_leg(cpus: int, sf_dir: str, op: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir, op],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(f"leg cpus={cpus} op={op} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    sf_dir = _gen_docs(n_entities)
    lo, hi = legs
    result = {"probe": "dedup_family", "n_entities": n_entities,
              "legs": legs, "trials": trials}
    for op in ("dup_spans", "decontamination"):
        best = {}
        for cpus in (lo, hi):
            runs = [_run_leg(cpus, sf_dir, op) for _ in range(trials)]
            for r in runs:
                print(json.dumps(r), flush=True)
            best[cpus] = {
                k: (min(r[k] for r in runs) if k.endswith("_sec") else runs[0][k])
                for k in runs[0]
            }
        result.setdefault("docs", best[lo]["docs"])
        eff = (best[lo][op + "_sec"] / best[hi][op + "_sec"]) / (hi / lo)
        result[op] = {
            f"sec_{lo}": best[lo][op + "_sec"],
            f"sec_{hi}": best[hi][op + "_sec"],
            "rows": best[lo][op + "_rows"],
            "efficiency": round(eff, 3),
        }
        assert best[lo][op + "_rows"] == best[hi][op + "_rows"], op
    print(json.dumps(result))


if __name__ == "__main__":
    main()
