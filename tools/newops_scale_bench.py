"""Scaling probe for the round-5 session-2 operators — the events
analytics trio over a 20M-row synthesized events table, and the
document-shaped ops (survivorship, snapshot_diff, prefix_jaccard_join)
over the 1M-doc dense corpus. Same isolated-subprocess / N-vs-4N
pattern as the sibling campaigns (fresh JVM per (op, leg), best-of-
``SCALING_TRIALS``).

The big events table is synthesized once from ``spark.range``:
``EVENTS_N`` rows (default 20M) across ``EVENTS_N // 100`` users,
deterministic timestamps (seconds-scale strides keyed on id residues so
sessions/funnels/cohorts all have non-trivial structure) and five event
types in the testdata proportions.

Usage: ``python tools/newops_scale_bench.py``; env knobs:
``SCALING_LEGS`` (default "2,8"), ``SCALING_TRIALS`` (default 1),
``NEWOPS`` (op subset), ``EVENTS_N``, ``DOCS_ENTITIES`` (default
300_000 → the cached 1M-doc graph corpus).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_EVENT_OPS = ["event_sessions", "funnel_conversion", "retention_cohorts"]
_DOC_OPS = ["survivorship", "snapshot_diff", "prefix_jaccard_join",
            "fs_pair_posteriors", "domain_posterior_scores",
            "multipass_blocking",
            # session-4 additions
            "edit_distance_join", "pair_features", "ari_quality",
            "cluster_conflicts", "fs_mutual_match", "metablocking_prune",
            "containment_join", "waterfall_link", "muc_quality",
            "fs_tf_posteriors", "clk_linkage", "group_linkage",
            "lm_fluency", "fs_uncertain_pairs", "vmeasure_quality",
            "blanc_quality", "kcore_decomposition"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; which = sys.argv[3]
os.environ.setdefault(
    "SPARK_DRIVER_MEM",
    f"{int(os.environ.get('DEDUP_BENCH_GB_PER_CORE', '6')) * cpus}g",
)
from biomedical_entity_linking_spark.session import get_spark
from biomedical_entity_linking_spark.operators import (
    containment, editjoin, er_quality, events_analytics, fellegi_sunter,
    grouplink, kcore, metablocking, ml_features, phonetic_blocking, pprl,
    setjoin, survivorship, text_analysis, waterfall, weburl)

_FNS = {
    "event_sessions": events_analytics.event_sessions,
    "funnel_conversion": events_analytics.funnel_conversion,
    "retention_cohorts": events_analytics.retention_cohorts,
    "survivorship": survivorship.survivorship,
    "snapshot_diff": weburl.snapshot_diff,
    "prefix_jaccard_join": setjoin.prefix_jaccard_join,
    "fs_pair_posteriors": fellegi_sunter.fs_pair_posteriors,
    "domain_posterior_scores": text_analysis.domain_posterior_scores,
    "multipass_blocking": phonetic_blocking.multipass_blocking,
    "edit_distance_join": editjoin.edit_distance_join,
    "pair_features": ml_features.pair_features,
    "ari_quality": er_quality.ari_quality,
    "cluster_conflicts": survivorship.cluster_conflicts,
    "fs_mutual_match": fellegi_sunter.fs_mutual_match,
    "metablocking_prune": metablocking.metablocking_prune,
    "containment_join": containment.containment_join,
    "waterfall_link": waterfall.waterfall_link,
    "fs_tf_posteriors": fellegi_sunter.fs_tf_posteriors,
    "clk_linkage": pprl.clk_linkage,
    "group_linkage": grouplink.group_linkage,
    "lm_fluency": text_analysis.lm_fluency,
    "fs_uncertain_pairs": fellegi_sunter.fs_uncertain_pairs,
    "vmeasure_quality": er_quality.vmeasure_quality,
    "blanc_quality": er_quality.blanc_quality,
    "kcore_decomposition": kcore.kcore_decomposition,
    "muc_quality": er_quality.muc_quality,
}
parts = int(os.environ.get("DEDUP_BENCH_PARTS", "64"))
spark = get_spark(app_name=f"newops{cpus}", cores=cpus,
                  shuffle_partitions=max(parts, 2 * cpus))
table = "events" if which in ("event_sessions", "funnel_conversion",
                              "retention_cohorts") else "documents"
n = spark.read.parquet(f"{sf_dir}/{table}.parquet").count()  # warm scan
t0 = time.time()
df = _FNS[which](spark, sf_dir)
df.write.format("noop").mode("overwrite").save()
sec = round(time.time() - t0, 2)
rows = df.count()
print(json.dumps({"cpus": cpus, "input_rows": n, "op": which,
                  "rows": rows, "sec": sec}))
"""


def _events_dir(n: int) -> str:
    sys.path.insert(0, ".")
    path = f"/tmp/spark_linkage_scaling/events_{n}_seed42"
    if not os.path.exists(path + "._OK"):
        from pyspark.sql import functions as F

        from biomedical_entity_linking_spark.session import get_spark

        spark = get_spark(app_name="events-gen", cores=32)
        users = n // 100
        # u = user, k = the user's k-th event: minutes apart within a
        # burst, a 2h jump every 50th (session break), cohort spread via
        # a per-user day offset; event types cycle per user so funnels
        # have real structure
        base = spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") % users).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + (F.col("id") % users % 30) * 86_400_000_000
                + F.expr(f"id div {users}") * 60_000_000
                + F.expr(f"(id div {users}) div 50") * 7_200_000_000
            ).alias("ts"),
            F.element_at(
                F.array(*[F.lit(x) for x in
                          ("view", "click", "purchase", "signup", "error")]),
                ((F.col("id") % users + F.expr(f"id div {users}")) % 5 + 1
                 ).cast("int"),
            ).alias("event_type"),
            ((F.col("id") % 1000) / 10.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        base.repartition(64).write.mode("overwrite").parquet(
            f"{path}/events.parquet"
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
    legs = [int(x) for x in os.environ.get("SCALING_LEGS", "2,8").split(",")]
    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    events_n = int(os.environ.get("EVENTS_N", str(20_000_000)))
    doc_entities = int(os.environ.get("DOCS_ENTITIES", "300000"))
    ops = os.environ.get("NEWOPS", ",".join(_EVENT_OPS + _DOC_OPS)).split(",")
    ev_dir = _events_dir(events_n) if any(o in _EVENT_OPS for o in ops) else None
    doc_dir = None
    if any(o in _DOC_OPS for o in ops):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from graph_scale_bench import _dense_dir

        def _with_meta(base: str) -> str:
            # survivorship needs the full documents schema; derive the
            # metadata columns deterministically (trainmix precedent)
            path = base + "_meta"
            if not os.path.exists(path + "._OK"):
                from pyspark.sql import functions as F

                from biomedical_entity_linking_spark.session import get_spark

                spark = get_spark(app_name="meta-gen", cores=32)
                docs = spark.read.parquet(f"{base}/documents.parquet")
                lang = F.element_at(
                    F.array(*[F.lit(x) for x in
                              ("en", "en", "en", "zh", "de", "fr", "es",
                               "xx")]),
                    (F.pmod(F.col("doc_id"), 8) + 1).cast("int"),
                )
                src = F.concat(
                    F.lit("src"), (F.col("doc_id") % 20).cast("string")
                )
                docs.select(
                    "doc_id", "text",
                    F.length("text").alias("n_chars"),
                    lang.alias("lang"), src.alias("source"),
                ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
                with open(path + "._OK", "w") as f:
                    f.write("ok")
                spark.stop()
            return path

        doc_dir = _with_meta(_dense_dir(doc_entities))
    lo, hi = legs
    result = {"probe": "newops", "legs": legs, "trials": trials,
              "events_n": events_n}
    for op in ops:
        sf_dir = ev_dir if op in _EVENT_OPS else doc_dir
        if sf_dir is None:
            continue
        best = {}
        rows = None
        for cpus in (lo, hi):
            runs = [_run(cpus, sf_dir, op) for _ in range(trials)]
            for r in runs:
                print(json.dumps(r), flush=True)
            best[cpus] = min(r["sec"] for r in runs)
            rows = runs[0]["rows"]
        eff = (best[lo] / best[hi]) / (hi / lo)
        result[op] = {f"sec_{lo}": best[lo], f"sec_{hi}": best[hi],
                      "rows": rows, "efficiency": round(eff, 3)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
