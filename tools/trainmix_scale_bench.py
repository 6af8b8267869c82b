"""Scaling probe for the training-mix operator family at ~1M docs:
``stratified_sample`` (pure map), ``shard_packing`` (one stream-key
shuffle + running-sum window), ``vocab_topk`` (partial-agg counts +
TakeOrdered) and ``pii_scrub`` (pure regex map) — the same fresh-
subprocess / per-core-heap / N-vs-4N evidence pattern as
``dedup_scale_bench.py``, with one subprocess per (op, leg).

Input reuses the cached dedup corpus (doc_id, text), augmented ONCE with
deterministic lang/source columns (five langs keyed on doc_id) so the
sampling operator has its stratification key.

Usage: ``python tools/trainmix_scale_bench.py [n_entities]`` (default
300_000 ≈ 1M docs); legs via ``SCALING_LEGS`` (default "2,8"), trials
via ``SCALING_TRIALS`` (default 1), op subset via ``TRAINMIX_OPS``
(comma-separated, default all four).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_OPS = ["stratified_sample", "shard_packing", "vocab_topk", "pii_scrub"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators import text_analysis as TA

parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
spark = get_spark(app_name=f"mixscale{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = docs.count()  # warm scan
df = getattr(TA, which)(spark, sf_dir)
# rows-sanity via count() for the row-preserving map ops (count prunes
# their computed columns, so it is ~free); skipped (-1) for vocab_topk,
# where count would re-execute the whole aggregate and double the leg
rows = -1 if which == "vocab_topk" else df.count()
# timed section is a noop WRITE, not count(): count lets Catalyst prune
# every computed column (regexes, windows, samples never run) — the
# map-shaped ops would time the scan alone
t0 = time.time()
df.write.format("noop").mode("overwrite").save()
print(json.dumps({"cpus": cpus, "docs": n, "op": which,
                  "rows": rows, "sec": round(time.time() - t0, 2)}))
"""


def _augmented_dir(n_entities: int) -> str:
    sys.path.insert(0, ".")
    base = f"/tmp/spark_linkage_scaling/dedup_docs_{n_entities}_seed42"
    path = f"/tmp/spark_linkage_scaling/mix_docs_{n_entities}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        from biomedical_entity_linking_spark.session import get_spark

        if not os.path.exists(base + "._OK"):
            # generate the base corpus FIRST: _gen_docs stops its session
            # when done, so acquiring ours before it would hand us a
            # stopped context (it returns the existing session if one is
            # already live)
            from tools.dedup_scale_bench import _gen_docs

            _gen_docs(n_entities)
        spark = get_spark(app_name="mix-gen", cores=32)
        docs = spark.read.parquet(f"{base}/documents.parquet")
        lang = F.element_at(
            F.array(*[F.lit(x) for x in ("en", "en", "en", "zh", "de",
                                         "fr", "es", "xx")]),
            (F.pmod(F.col("doc_id"), 8) + 1).cast("int"),
        )
        docs.select(
            "doc_id", "text", lang.alias("lang"), F.lit("crawl").alias("source")
        ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _run(cpus: int, sf_dir: str, op: str) -> dict:
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
    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    sf_dir = _augmented_dir(n_entities)
    lo, hi = legs
    ops = [
        op
        for op in os.environ.get("TRAINMIX_OPS", ",".join(_OPS)).split(",")
        if op in _OPS
    ]
    result = {"probe": "trainmix", "n_entities": n_entities,
              "legs": legs, "trials": trials}
    for op in ops:
        best = {}
        for cpus in (lo, hi):
            runs = [_run(cpus, sf_dir, op) for _ in range(trials)]
            for r in runs:
                print(json.dumps(r), flush=True)
            best[cpus] = min(r["sec"] for r in runs)
            rows = runs[0]["rows"]
            result.setdefault("docs", runs[0]["docs"])
        eff = (best[lo] / best[hi]) / (hi / lo)
        result[op] = {f"sec_{lo}": best[lo], f"sec_{hi}": best[hi],
                      "rows": rows, "efficiency": round(eff, 3)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
