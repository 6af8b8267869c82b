"""Standalone scaling probe for round 5's new operators:
``neardup_clusters`` (MinHash-LSH candidates → gated edges →
large-star/small-star connected components → per-doc cluster labels —
the heaviest new round-5 operator: a shingle relation, a banded
self-join AND an iterative CC all in one query) and ``url_dedup``
(per-row URL canonicalization + counting groupBy — expected to scale
near-perfectly: one codegen span into one small-group shuffle).

Same N vs 4N evidence pattern as ``dedup_scale_bench.py``: input
materialized once, each (op, leg) in its OWN fresh subprocess with heap
scaled per-core, best-of-N trials.

The corpus derives from the distributed pages generator: pages of one
entity share phrasing, so LSH candidates form real small cliques (the
near-dup structure a crawl has), and CC closes them. For url_dedup the
corpus carries the (doc_id, source, n_chars) columns the driver query's
deterministic URL synthesis expects.

Usage: ``python tools/neardup_scale_bench.py [n_entities]`` (default
100_000 ≈ 333k docs); legs via ``SCALING_LEGS`` (default "2,8"),
trials via ``SCALING_TRIALS`` (default 2),
op subset via ``SCALING_OPS`` (comma list, default both),
heap via ``DEDUP_BENCH_GB_PER_CORE`` (default 6 g/core).
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
from biomedical_entity_linking_spark.operators.dedup import neardup_clusters
from biomedical_entity_linking_spark.operators.weburl import url_dedup

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
spark = get_spark(app_name=f"neardupscale{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n = docs.count()  # warm scan
out = {"cpus": cpus, "docs": n, "op": which}
if which == "neardup_decomp":
    # phase decomposition: LSH candidate edges (shingle explode +
    # 16 min-aggs + banded self-join) vs iterative CC + readoff —
    # attributes the composite op's efficiency loss to a phase
    from biomedical_entity_linking_spark.operators.dedup import (
        minhash_lsh_candidates, NEARDUP_CC_THRESH,
    )
    from biomedical_entity_linking_spark.operators.connected_components \
        import connected_components
    epath = f"/tmp/spark_linkage_scaling/decomp_edges_{cpus}"
    t0 = time.time()
    minhash_lsh_candidates(spark, sf_dir).filter(
        F.col("est_jaccard") >= NEARDUP_CC_THRESH
    ).write.mode("overwrite").parquet(epath)
    out["edges_sec"] = round(time.time() - t0, 2)
    edges = spark.read.parquet(epath)
    out["edges_rows"] = edges.count()
    t0 = time.time()
    labels, _ = connected_components(edges, src="doc_a", dst="doc_b")
    lab = labels.select(F.col("url").alias("doc_id"),
                        F.col("component").alias("cluster"))
    sizes = lab.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    out["cc_rows"] = (
        lab.join(sizes, "cluster").filter(F.col("cluster_size") >= 2).count()
    )
    out["cc_sec"] = round(time.time() - t0, 2)
    out[which + "_sec"] = out["edges_sec"] + out["cc_sec"]
    out[which + "_rows"] = out["cc_rows"]
else:
    if which == "tfidf_cosine_topk":
        from biomedical_entity_linking_spark.operators.tfidf import (
            tfidf_cosine_topk,
        )
        cap = int(os.environ.get("TFIDF_DF_CAP", "0")) or None
        fn = lambda sp, sd: tfidf_cosine_topk(sp, sd, df_cap=cap)
    else:
        fn = neardup_clusters if which == "neardup_clusters" else url_dedup
    t0 = time.time()
    out[which + "_rows"] = fn(spark, sf_dir).count()
    out[which + "_sec"] = round(time.time() - t0, 2)
print(json.dumps(out))
"""


def _gen_docs(n_entities: int) -> str:
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.data.generator import (
        generate_pages_distributed,
    )
    from biomedical_entity_linking_spark.session import get_spark

    path = f"/tmp/spark_linkage_scaling/neardup_docs_{n_entities}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        spark = get_spark(app_name="neardup-gen", cores=32)
        pages, _ = generate_pages_distributed(
            spark, n_entities, seed=42, body_tokens=150, partitions=128
        )
        pages.select(
            F.abs(F.xxhash64("url")).alias("doc_id"),
            F.col("text"),
            # columns the url_dedup query's deterministic synthesis reads
            F.concat(
                F.lit("src"), (F.abs(F.xxhash64("url")) % 20).cast("string")
            ).alias("source"),
            F.length("text").alias("n_chars"),
        ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _gen_slim_docs(n_docs: int) -> str:
    """Key-columns-only corpus for url_dedup legs (``SCALING_SLIM_DOCS``).

    url_dedup's scan reads ONLY (doc_id, source) — the per-row
    canonicalization needs no content bytes (that is the operator's whole
    point at 100 TB). At body-bearing corpus sizes the op finishes in
    seconds and the measurement is all stage-launch fixed cost, so the
    slim mode synthesizes the key columns alone via ``spark.range`` at a
    cardinality where the per-row work dominates. Deterministic (pure
    function of the row id), no entity structure needed — url_dedup's
    dup groups come from its own doc_id-residue noise synthesis."""
    sys.path.insert(0, ".")
    from biomedical_entity_linking_spark.session import get_spark

    path = f"/tmp/spark_linkage_scaling/slim_urls_{n_docs}"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        spark = get_spark(app_name="slimurl-gen", cores=32)
        (
            spark.range(0, n_docs, 1, 128)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("src"), (F.col("id") % 20).cast("string")
                ).alias("source"),
                (F.lit(80) + F.col("id") % 400).alias("n_chars"),
            )
            .write.mode("overwrite")
            .parquet(f"{path}/documents.parquet")
        )
        with open(path + "._OK", "w") as f:
            f.write("ok")
        spark.stop()
    return path


def _run_leg(cpus: int, sf_dir: str, op: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), sf_dir, op],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        raise SystemExit(
            f"leg cpus={cpus} op={op} failed:\n{out.stderr[-3000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "2"))
    slim_docs = int(os.environ.get("SCALING_SLIM_DOCS", "0"))
    if slim_docs:
        sf_dir = _gen_slim_docs(slim_docs)
    else:
        sf_dir = _gen_docs(n_entities)
    lo, hi = legs
    result = {
        "probe": "neardup_weburl" if not slim_docs else "weburl_slim",
        "n_entities": n_entities if not slim_docs else None,
        "legs": legs,
        "trials": trials,
    }
    ops = tuple(
        os.environ.get("SCALING_OPS", "url_dedup,neardup_clusters").split(",")
    )
    for op in ops:
        best = {}
        for cpus in (lo, hi):
            runs = [_run_leg(cpus, sf_dir, op) for _ in range(trials)]
            for r in runs:
                print(json.dumps(r), flush=True)
            best[cpus] = {
                k: (
                    min(r[k] for r in runs)
                    if k.endswith("_sec")
                    else runs[0][k]
                )
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
        for phase in ("edges", "cc"):  # per-phase, decomp mode only
            key = phase + "_sec"
            if key in best[lo]:
                result[op][f"{phase}_sec_{lo}"] = best[lo][key]
                result[op][f"{phase}_sec_{hi}"] = best[hi][key]
                result[op][f"{phase}_efficiency"] = round(
                    (best[lo][key] / best[hi][key]) / (hi / lo), 3
                )
        assert best[lo][op + "_rows"] == best[hi][op + "_rows"], op
    print(json.dumps(result))


if __name__ == "__main__":
    main()
