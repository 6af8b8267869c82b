"""Dense scaling probe for k-core decomposition.

The session-7 newops campaign measured the first (un-pinned) kcore
plan at the 1M-doc corpus (~1.9M onion edges): 35.9 s @2 → 35.2 s @8,
eff 0.255 (``newops_campaign_r5_s7.log``), and this probe reproduced
the flat shape at 10M docs / ~18.7M edges: 387.6 → 309.3, eff 0.313
(``kcore_campaign_r5_naive.log``) — NOT the small-per-round-work
regime pagerank escaped by densifying, but AQE coalescing the narrow
16-byte-row shuffles to single-digit partition counts at BOTH legs.
The shipped plan repartition-pins every per-round checkpoint on its
join key and folds the peel test into one degree-marked relation
(``operators/kcore.py`` scale-shape note); this probe measures that
plan in ``kcore_campaign_r5_pinned2.log``.

kcore_decomposition reads ONLY ``doc_id`` (the onion graph is
synthesized from id residues — ``operators/kcore.py`` module doc), so
the honest dense probe is an id-dense corpus: ``spark.range(N)`` with
an empty text column, matching the documents schema kcore touches.
Parquet column pruning makes the text column free either way; this is
the same synthesize-from-range precedent as ``_events_dir`` in
``newops_scale_bench.py``.

Isolated-subprocess discipline (one fresh JVM per (leg)), best-of-
``SCALING_TRIALS``, legs from ``SCALING_LEGS`` (default "2,8"), corpus
size from ``KCORE_DOCS`` (default 10_000_000 → ~18.7M distinct
undirected edges).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
os.environ["SPARK_LINKAGE_CORES"] = str(cpus)
os.environ.setdefault(
    "SPARK_LINKAGE_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
sys.path.insert(0, ".")
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators import kcore

parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
spark = get_spark(app_name=f"kcore{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm scan
t0 = time.time()
df = kcore.kcore_decomposition(spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
sec = round(time.time() - t0, 2)
rows = df.count()
print(json.dumps({"cpus": cpus, "input_rows": n, "op": "kcore_decomposition",
                  "rows": rows, "sec": sec}))
"""


def _id_docs_dir(n: int) -> str:
    sys.path.insert(0, ".")
    path = f"/tmp/spark_linkage_scaling/iddocs_{n}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        from biomedical_entity_linking_spark.session import get_spark

        spark = get_spark(app_name="iddocs-gen", cores=32)
        spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("").alias("text")
        ).repartition(64).write.mode("overwrite").parquet(
            f"{path}/documents.parquet"
        )
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _run(cpus: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(f"leg cpus={cpus} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    docs_n = int(os.environ.get("KCORE_DOCS", str(10_000_000)))
    sf_dir = _id_docs_dir(docs_n)
    lo, hi = legs
    best = {}
    rows = None
    for cpus in legs:
        for _ in range(trials):
            r = _run(cpus, sf_dir)
            print(json.dumps(r), flush=True)
            key = f"sec_{cpus}"
            best[key] = min(best.get(key, float("inf")), r["sec"])
            rows = r["rows"]
    eff = round(best[f"sec_{lo}"] / best[f"sec_{hi}"] / (hi / lo), 3)
    print(json.dumps({"probe": "kcore_dense", "legs": legs, "trials": trials,
                      "docs_n": docs_n,
                      "kcore_decomposition": {**best, "rows": rows,
                                              "efficiency": eff}}),
          flush=True)


if __name__ == "__main__":
    main()
