"""Spark-free control for the vocab_topk scaling campaign.

``trainmix_scale_bench.py`` measures the single-scan vocab_topk
(lower/split/explode -> xxhash64 -> repartition -> bounded hash-count ->
TakeOrdered) at 2->8 efficiency ~0.69 on this box. Decomposition
(``vocab_decompose_probe.py``) attributes the gap to the shuffle+count
increment (0.58) vs the pure string path (0.79). This control decides
whether that residue is the PLAN or the BOX: it runs the same
tokenize-then-hash-count kernel — pandas C-level lower/strip/split,
object-string explode, ``value_counts`` hash aggregation (the allocator
and memory-bus profile of the Spark kernel, minus JVM/shuffle) — over
the SAME corpus in N plain ``multiprocessing`` workers, each owning a
slice of the parquet files, merging per-worker counts only for the
top-candidate sanity readoff (untimed).

If the control reads ~0.7 at 2->8, eight concurrent hash-count kernels
saturate this box's memory system and the Spark path is exonerated (a
real cluster gives each executor its own memory channels). If it reads
>=0.9, the residue lives in the Spark path.

Usage: ``python tools/vocab_kernel_probe.py [corpus_dir]``; legs via
``SCALING_LEGS`` (default "2,8"), trials via ``SCALING_TRIALS``
(default 1).
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import time

DEFAULT_CORPUS = (
    "/tmp/spark_linkage_scaling/mix_docs_300000_seed42/documents.parquet"
)


def _worker(files: list[str], out_q) -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    chunks = [
        pq.read_table(f, columns=["text"]).to_pandas()["text"] for f in files
    ]
    text = pd.concat(chunks, ignore_index=True)
    # warm read done; time ONLY the kernel: lower/strip/split (C-level),
    # object-string explode, hash-count — the vocab_topk work shape
    t0 = time.time()
    toks = text.str.lower().str.strip().str.split()
    exploded = toks.explode()
    counts = exploded.value_counts()
    kernel = time.time() - t0
    out_q.put(
        {
            "rows": int(len(text)),
            "tokens": int(len(exploded)),
            "distinct": int(len(counts)),
            "kernel_sec": kernel,
        }
    )


def _run_leg(files: list[str], n_workers: int) -> dict:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(files[i::n_workers], q))
        for i in range(n_workers)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    return {
        "workers": n_workers,
        "rows": sum(r["rows"] for r in results),
        "tokens": sum(r["tokens"] for r in results),
        "wall_sec": round(wall, 2),
        "max_kernel_sec": round(max(r["kernel_sec"] for r in results), 2),
    }


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CORPUS
    files = sorted(glob.glob(f"{corpus}/*.parquet"))
    if not files:
        raise SystemExit(f"no parquet under {corpus}")
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    lo, hi = legs
    best = {}
    for n_workers in (lo, hi):
        runs = [_run_leg(files, n_workers) for _ in range(trials)]
        best[n_workers] = min(runs, key=lambda r: r["max_kernel_sec"])
        print(json.dumps(best[n_workers]), flush=True)
    # efficiency on the slowest worker's kernel time: pure compute+memory,
    # no read skew (reads are untimed and page-cache warm after leg 1)
    eff = (best[lo]["max_kernel_sec"] / best[hi]["max_kernel_sec"]) / (
        hi / lo
    )
    print(
        json.dumps(
            {
                "probe": "vocab_kernel_no_spark",
                "legs": legs,
                "trials": trials,
                f"kernel_{lo}": best[lo]["max_kernel_sec"],
                f"kernel_{hi}": best[hi]["max_kernel_sec"],
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
