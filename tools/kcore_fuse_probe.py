"""Head-to-head probe: kcore per-round checkpoint fusion (r6 'not yet
optimized' item). Variant A = shipped formulation (eager localCheckpoint on
BOTH the degree-marked relation and the updated edge relation — two barrier
jobs per round). Variant B = lazy edge checkpoint: the semi-join edge update
materializes INSIDE the next round's marked job (one barrier per round);
the final survivors job materializes the last round's edges.

Each leg runs in its own subprocess (fresh JVM) so first-shot walls are
comparable; legs alternate A/B to share window noise. In-session repeats
give the steady-state read. Output equality is asserted on every leg via an
order-insensitive blake2b hash of the full result.

Usage: python tools/kcore_fuse_probe.py            # run alternating legs
       python tools/kcore_fuse_probe.py --leg A|B  # (internal) one leg
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = 3


def kcore_variant_b(spark, sf_dir):
    """kcore_decomposition with lazy per-round edge checkpoints."""
    from pyspark.sql import functions as F

    from biomedical_entity_linking_spark.operators.kcore import (
        K_CORE,
        N_ROUNDS,
        _degrees,
        _kcore_edges,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_parts = spark.sparkContext.defaultParallelism * 2
    und = (
        _kcore_edges(docs)
        .repartition(n_parts, "a")
        .localCheckpoint(eager=True)
    )
    alive = (
        docs.select(F.col("doc_id").alias("node"))
        .repartition(n_parts, "node")
        .localCheckpoint(eager=True)
    )
    peeled_parts = []
    for r in range(1, N_ROUNDS + 1):
        marked = (
            alive.join(_degrees(und), "node", "left")
            .select("node", F.coalesce(F.col("deg"), F.lit(0)).alias("d"))
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)  # the round's ONE barrier
        )
        peeled = marked.filter(F.col("d") < K_CORE)
        peeled_parts.append(
            peeled.select("node", F.lit(r).cast("bigint").alias("peel_round"))
        )
        alive = marked.filter(F.col("d") >= K_CORE).select("node")
        und = (
            und.join(alive, und.a == alive.node, "left_semi")
            .join(alive, und.b == alive.node, "left_semi")
            .repartition(n_parts, "a")
            .localCheckpoint(eager=False)  # fused into the NEXT round's job
        )
    survivors = alive.join(_degrees(und), "node", "left").select(
        F.col("node").alias("doc_id"),
        F.lit(0).cast("bigint").alias("peel_round"),
        F.coalesce(F.col("deg"), F.lit(0)).alias("core_deg"),
    )
    removed = peeled_parts[0]
    for part in peeled_parts[1:]:
        removed = removed.unionByName(part)
    removed = removed.select(
        F.col("node").alias("doc_id"),
        "peel_round",
        F.lit(0).cast("bigint").alias("core_deg"),
    )
    return survivors.unionByName(removed).orderBy("doc_id")


def result_hash(df) -> str:
    from hashlib import blake2b

    rows = sorted(tuple(r) for r in df.collect())
    h = blake2b(digest_size=12)
    for row in rows:
        h.update(repr(row).encode())
    return h.hexdigest()


def run_leg(leg: str) -> None:
    from biomedical_entity_linking_spark.operators.kcore import (
        kcore_decomposition,
    )
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name=f"kcore_fuse_{leg}", cores=CPUS)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    fn = kcore_decomposition if leg == "A" else kcore_variant_b
    samples = []
    for i in range(REPEATS):
        spark.sparkContext.setJobDescription(f"kcore_{leg}#{i}")
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    h = result_hash(fn(spark, SF_DIR))
    print(json.dumps({"leg": leg, "samples": samples, "hash": h}))


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        run_leg(sys.argv[2])
        return
    results = []
    for leg in ["A", "B", "A", "B", "A", "B"]:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg],
            capture_output=True,
            text=True,
            cwd=ROOT,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode != 0 or not line:
            print(f"LEG {leg} FAILED rc={p.returncode}")
            print(p.stderr[-2000:])
            sys.exit(1)
        rec = json.loads(line[-1])
        print(rec)
        results.append(rec)
    hashes = {r["hash"] for r in results}
    agg = {
        leg: {
            "first_shots": [r["samples"][0] for r in results if r["leg"] == leg],
            "steady_min": min(
                min(r["samples"][1:]) for r in results if r["leg"] == leg
            ),
        }
        for leg in ("A", "B")
    }
    print(
        json.dumps(
            {"sf": SF_DIR, "cpus": CPUS, "hash_agree": len(hashes) == 1, **agg}
        )
    )


if __name__ == "__main__":
    main()
