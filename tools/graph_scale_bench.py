"""Scaling probe for the round-5 graph/ER operators at ~1M docs:
``triangle_count`` (degree-ordered orientation), ``pagerank``
(5 integer-exact iterations) and ``incremental_linkage`` (delta vs
canonical attach) — same fresh-subprocess / per-core-heap / N-vs-4N
evidence pattern as ``dedup_scale_bench.py``, one subprocess per
(op, leg).

Input: the cached dedup corpus re-keyed to DENSE doc_ids (row_number
over the hash order) — the synthesized link relation squares doc_id,
so the xxhash64 ids the dedup corpus carries would overflow int64;
dense 0..n−1 ids are also what the sf testdata tables use, keeping the
op code identical between the driver queries and this probe.

Usage: ``python tools/graph_scale_bench.py [n_entities]`` (default
300_000 ≈ 1M docs); legs via ``SCALING_LEGS`` (default "2,8"), trials
via ``SCALING_TRIALS`` (default 1), op subset via ``GRAPH_OPS``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_OPS = ["triangle_count", "pagerank", "incremental_linkage",
        "label_propagation"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators import incremental, linkgraph

_FNS = {
    "triangle_count": linkgraph.triangle_count,
    "pagerank": linkgraph.pagerank,
    "incremental_linkage": incremental.incremental_linkage,
    "label_propagation": linkgraph.label_propagation,
}
density = int(os.environ.get("GRAPH_DENSITY", "0"))
if density:
    # input-density axis: extend the synthesized link GENERATOR with more
    # affine-permutation out-links per page (operator code untouched) so
    # the per-iteration work grows while barrier count stays fixed — the
    # amortization measurement (cf. CC: eff 0.58 at 1M edges, 0.91 at 30M)
    extra = tuple(
        f"({p} * doc_id + {i}) % n_docs"
        for i, p in enumerate((11, 13, 17, 19, 23, 29, 31, 37)[:density])
    )
    linkgraph._LINK_EXPRS = linkgraph._LINK_EXPRS + extra
parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
spark = get_spark(app_name=f"graphscale{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = docs.count()  # warm scan
t0 = time.time()
df = _FNS[which](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
sec = round(time.time() - t0, 2)
# rows OUTSIDE the timed span (second execution would double-bill the
# iterative ops, whose localCheckpoints make the recount cheap anyway)
rows = df.count()
print(json.dumps({"cpus": cpus, "docs": n, "op": which,
                  "rows": rows, "sec": sec}))
"""


def _dense_dir(n_entities: int) -> str:
    sys.path.insert(0, ".")
    base = f"/tmp/spark_linkage_scaling/dedup_docs_{n_entities}_seed42"
    path = f"/tmp/spark_linkage_scaling/graph_docs_{n_entities}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from biomedical_entity_linking_spark.session import get_spark

        if not os.path.exists(base + "._OK"):
            from tools.dedup_scale_bench import _gen_docs

            _gen_docs(n_entities)
        spark = get_spark(app_name="graph-gen", cores=32)
        docs = spark.read.parquet(f"{base}/documents.parquet")
        # dense re-key: zipWithIndex via window over the hash id (one-off
        # generation cost, not part of any timed leg)
        w = Window.orderBy("doc_id")
        docs.select(
            # bigint, matching the sf testdata schema — row_number's int
            # would overflow ANSI int32 inside the squared link expr
            (F.row_number().over(w) - 1).cast("bigint").alias("doc_id"),
            "text",
        ).repartition(64).write.mode("overwrite").parquet(
            f"{path}/documents.parquet"
        )
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
    sf_dir = _dense_dir(n_entities)
    lo, hi = legs
    ops = [
        op
        for op in os.environ.get("GRAPH_OPS", ",".join(_OPS)).split(",")
        if op in _OPS
    ]
    result = {"probe": "graph", "n_entities": n_entities,
              "legs": legs, "trials": trials}
    for op in ops:
        best = {}
        rows = None
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
