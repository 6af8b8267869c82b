"""Spark-free control for the features-stage scaling probe.

``features_scale_bench.py`` measured the embedding stage at ~0.70
efficiency 2→8 even with ALL I/O on tmpfs — so either (a) the box cannot
run 8 copies of this kernel at 4x the 2-copy speed (memory
bandwidth/allocator contention — a sandbox artifact that hits any
parallel Python the same way), or (b) Spark's Arrow/worker path adds a
non-scaling overhead worth fixing. This probe decides: it runs the SAME
pure kernel (``embed_batch`` + int8 quantization, exactly the
``scoring.embed_udf`` body) over the SAME cached records in N plain
``multiprocessing`` workers — no JVM, no Arrow, no shuffle. Each worker
reads its own slice of the parquet files (page-cache-warm) and times
ONLY the kernel loop.

If this control shows the same ~0.70 at 2→8, the box is the ceiling and
the Spark path is exonerated (the stage would scale on a real cluster
where each executor owns its memory channels). If it scales ≥0.9, the
gap lives in the Spark worker path.

Usage: ``python tools/features_kernel_probe.py [records_path]``; legs via
``SCALING_LEGS`` (default "2,8"), trials via ``SCALING_TRIALS``.
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

DEFAULT_RECORDS = "/tmp/spark_linkage_scaling/feat_records_300000_seed42"
BATCH = 10_000  # rows per kernel call — matches the Arrow batch setting


def _worker(files: list[str], out_q) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    import pyarrow.parquet as pq

    from biomedical_entity_linking_spark.functions.embeddings import (
        BulkTokenCache,
    )
    from biomedical_entity_linking_spark.operators.scoring import SCORING_DIM

    from biomedical_entity_linking_spark.functions.embeddings import embed_batch

    import pandas as pd

    texts = []
    for f in files:
        texts.append(pq.read_table(f, columns=["extracted_text"]).to_pandas())
    pdf = pd.concat(texts, ignore_index=True)["extracted_text"]
    cache = BulkTokenCache(SCORING_DIM)
    n = 0
    t0 = time.time()
    for start in range(0, len(pdf), BATCH):
        batch = pdf.iloc[start : start + BATCH]
        vecs = embed_batch(batch, SCORING_DIM, cache, as_numpy=True)
        q = np.clip(np.round(vecs * 127), -127, 127).astype(np.int8)
        q.tolist()  # same C-level conversion the UDF pays
        n += len(batch)
    out_q.put({"rows": n, "kernel_sec": time.time() - t0})


def _run_leg(files: list[str], n_workers: int) -> dict:
    q = mp.Queue()
    procs = []
    for i in range(n_workers):
        procs.append(
            mp.Process(target=_worker, args=(files[i::n_workers], q))
        )
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    rows = sum(r["rows"] for r in results)
    return {
        "workers": n_workers,
        "rows": rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(rows / wall),
        "max_kernel_sec": round(max(r["kernel_sec"] for r in results), 2),
    }


def main() -> None:
    records = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_RECORDS
    files = sorted(glob.glob(f"{records}/*.parquet"))
    if not files:
        raise SystemExit(f"no parquet under {records}")
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    lo, hi = legs
    best = {}
    for n_workers in (lo, hi):
        runs = [_run_leg(files, n_workers) for _ in range(trials)]
        best[n_workers] = min(runs, key=lambda r: r["wall_sec"])
        print(json.dumps(best[n_workers]), flush=True)
    eff = (best[lo]["wall_sec"] / best[hi]["wall_sec"]) / (hi / lo)
    print(json.dumps({
        "probe": "features_kernel_no_spark", "legs": legs,
        "trials": trials,
        f"rps_{lo}": best[lo]["rows_per_sec"],
        f"rps_{hi}": best[hi]["rows_per_sec"],
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
