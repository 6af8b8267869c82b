"""50M-item scaling probe for ``vmeasure_over`` — the same method as the
session-5 muc50m probe (which exposed MUC's window bottleneck that the
1M-doc reading's fixed-cost floor hid): synthesize the (sys, gold)
label relation straight from ``spark.range`` with the exact
``_sys_gold_docs`` corruption pattern (over-merge gold 5k/5k+1,
over-split id ≡ 3 mod 8), run the operator core, and time N-vs-4N legs
in isolated JVMs (fresh driver per (leg, trial), best-of-trials).

The 1M-doc harness leg (``newops_scale_bench.py``) measures the op
behind a corpus scan; this probe isolates the contingency pipeline
itself at 50M items / 12.5M gold clusters, where the marginal-rejoin
joins — not the scan — dominate.

Usage: ``python tools/vmeasure50m_probe.py``; env knobs
``SCALING_LEGS`` (default "2,8"), ``SCALING_TRIALS`` (default 2),
``VM_N`` (default 50_000_000), ``VM_OP`` ("vmeasure" | "blanc" —
``blanc_over`` shares the probe since it runs the same contingency
pipeline with per-side pair sums in place of entropies).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); n = int(sys.argv[2])
os.environ.setdefault("SPARK_DRIVER_MEM", f"{6 * cpus}g")
from pyspark.sql import functions as F
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators.er_quality import (
    blanc_over, vmeasure_over)

op = os.environ.get("VM_OP", "vmeasure")
core = {"vmeasure": vmeasure_over, "blanc": blanc_over}[op]
spark = get_spark(app_name=f"vm50m{cpus}", cores=cpus,
                  shuffle_partitions=max(64, 2 * cpus))
gold = F.expr("id div 4")
merged = F.when(gold % 5 < 2, gold - (gold % 5)).otherwise(gold)
docs = spark.range(n).select(
    F.when(F.col("id") % 8 == 3, F.lit(1_000_000_000_000) + F.col("id"))
    .otherwise(merged).alias("sys"),
    gold.alias("gold"),
)
t0 = time.time()
row = [list(r) for r in core(docs).collect()]
sec = round(time.time() - t0, 2)
print(json.dumps({"cpus": cpus, "op": op + "_quality",
                  "input_rows": n, "sec": sec, "row": row}))
"""


def _run(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), str(n)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(f"leg cpus={cpus} failed:\n{out.stderr[-3000:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    n = int(os.environ.get("VM_N", str(50_000_000)))
    best = {}
    rows = set()
    for cpus in legs:
        secs = []
        for _ in range(trials):
            rec = _run(cpus, n)
            secs.append(rec["sec"])
            rows.add(json.dumps(rec["row"]))
        best[cpus] = min(secs)
    assert len(rows) == 1, f"legs disagree on the result row: {rows}"
    lo, hi = legs[0], legs[-1]
    eff = round(best[lo] / (best[hi] * (hi / lo)), 3)
    op = os.environ.get("VM_OP", "vmeasure")
    print(json.dumps({"probe": op + "50m", "n": n, "trials": trials,
                      f"sec_{lo}": best[lo], f"sec_{hi}": best[hi],
                      "efficiency": eff}), flush=True)


if __name__ == "__main__":
    main()
