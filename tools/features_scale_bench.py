"""Standalone scaling probe for the FEATURES stage (the embedding UDF).

VERDICT r3 #2: the features stage measured 0.88 efficiency at 2→8 cores
but 0.65 at 4→16 — the one volume-proportional stage without a dedicated
probe like ``cc_scale_bench.py``'s. This harness isolates the stage: it
materializes the extract output (rid, norm_title, extracted_text) ONCE,
then times ONLY ``build_features`` (round-robin repartition + Arrow
pandas UDF + noop sink) at two parallelism levels in fresh subprocesses,
sweeping the Arrow batch size and the partition count. Verdict logic: if
the kernel scales ≥0.8 on some (batch, partitions) point in the clean
2→8 window, the 4→16 residue is box saturation (memory bandwidth /
hyperthread sharing), not a serialization bottleneck in the kernel.

Usage: ``python tools/features_scale_bench.py [n_entities]`` (default
300_000 ≈ 1M pages); legs via ``SCALING_LEGS`` (default "4,16"), trials
via ``SCALING_TRIALS`` (default 2), sweeps via ``FEATURES_BATCHES``
(default "10000,50000") and ``FEATURES_PARTS_MULT`` (default "2,4" — the
round-robin partition count as a multiple of cores).
``FEATURES_RECORDS_PATH`` overrides the cached input (e.g. a /dev/shm
copy, isolating single-disk scan bandwidth — a sandbox artifact, since
cluster executors scale disks with cores); combine with
``SPARK_LINKAGE_TMPFS=1`` to also move shuffle spill off the shared disk.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators.scoring import build_features

cpus = int(sys.argv[1]); records_path = sys.argv[2]
batch = int(sys.argv[3]); parts_mult = int(sys.argv[4])
spark = get_spark(
    app_name=f"featscale{cpus}",
    cores=cpus,
    shuffle_partitions=parts_mult * cpus,
    extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(batch)},
)
records = spark.read.parquet(records_path)
n = records.count()  # warms the scan
# warm the Python UDF worker pool + Arrow codepath on a small slice so we
# time steady-state execution, not interpreter startup
build_features(records.limit(2000)).write.format("noop").mode("overwrite").save()
t0 = time.time()
build_features(records).write.format("noop").mode("overwrite").save()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "records": n, "batch": batch,
                  "parts": parts_mult * cpus, "sec": round(dt, 2),
                  "recs_per_sec": round(n / dt)}))
"""


def _gen_records(n_entities: int) -> str:
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.extract import run_extract
    from biomedical_entity_linking_spark.session import get_spark

    path = f"/tmp/spark_linkage_scaling/feat_records_{n_entities}_seed42"
    if not os.path.exists(path + "._OK"):
        spark = get_spark(app_name="feat-gen", cores=32)
        pages, _ = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=150, partitions=128
        )
        run_extract(pages, "eng").select(
            "rid", "norm_title", "extracted_text"
        ).write.mode("overwrite").parquet(path)
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _run_leg(cpus: int, records_path: str, batch: int, parts_mult: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), records_path,
         str(batch), str(parts_mult)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(f"leg cpus={cpus} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "4,16").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    batches = [int(x) for x in
               os.environ.get("FEATURES_BATCHES", "10000,50000").split(",")]
    mults = [int(x) for x in
             os.environ.get("FEATURES_PARTS_MULT", "2,4").split(",")]
    records_path = os.environ.get("FEATURES_RECORDS_PATH") or _gen_records(
        n_entities
    )
    lo, hi = legs
    results = []
    for batch in batches:
        for mult in mults:
            best = {}
            for cpus in (lo, hi):
                runs = [_run_leg(cpus, records_path, batch, mult)
                        for _ in range(trials)]
                best[cpus] = min(runs, key=lambda r: r["sec"])
            eff = (best[lo]["sec"] / best[hi]["sec"]) / (hi / lo)
            row = {
                "batch": batch, "parts_mult": mult,
                f"sec_{lo}": best[lo]["sec"], f"sec_{hi}": best[hi]["sec"],
                f"rps_{lo}": best[lo]["recs_per_sec"],
                f"rps_{hi}": best[hi]["recs_per_sec"],
                "efficiency": round(eff, 3),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({
        "probe": "features_stage", "n_entities": n_entities,
        "records": best[lo]["records"], "legs": legs, "trials": trials,
        "best_efficiency": max(r["efficiency"] for r in results),
        "sweep": results,
    }))


if __name__ == "__main__":
    main()
