"""spark-submit application: run the flagship ER pipeline from a
``--py-files`` zip (north rule: "runs via spark-submit --py-files").

This file is the PRIMARY application file handed to spark-submit; the
engine package arrives ONLY through ``--py-files pkg.zip`` (the
orchestrator, ``tools/submit_scaling.py``, runs spark-submit from a
neutral cwd so the repo checkout is NOT on sys.path — the import below
fails unless the zip plumbing works). The script is master-agnostic:
``--master``/``--conf``/``--driver-memory`` come from the submit
command line, exactly as they would on a real cluster, and the session
is built with a bare ``getOrCreate()``.

Usage (via spark-submit):
    spark-submit --master local[N] --py-files pkg.zip \
        tools/submit_flagship.py <pages.parquet> <work_dir>

Prints one JSON line: {master, pyfiles_import, pages, clusters, sec,
docs_per_sec, stage_walls}.
"""

import json
import shutil
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    pages_path, work_dir = sys.argv[1], sys.argv[2]

    # Master-agnostic: every config (master, shuffle partitions, AQE,
    # arrow, memory) comes from the spark-submit command line.
    spark = SparkSession.builder.appName("spark-linkage-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # Prove the engine import came from the --py-files zip, not a
    # checkout on sys.path.
    import biomedical_entity_linking_spark as pkg
    from biomedical_entity_linking_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    pkg_file = pkg.__file__ or ""
    if ".zip" not in pkg_file:
        raise SystemExit(
            f"engine imported from {pkg_file!r}, not the --py-files zip — "
            "run the orchestrator from a neutral cwd"
        )

    pages = spark.read.parquet(pages_path)
    n = pages.count()  # warms the scan; also pins the input size

    t0 = time.time()
    out = run_pipeline(spark, pages, PipelineConfig(work_dir=work_dir))
    n_clusters = out["clusters"].count()
    dt = time.time() - t0
    shutil.rmtree(work_dir, ignore_errors=True)

    walls = {
        s: c.get("wall_sec")
        for s, c in out["counters"].items()
        if isinstance(c, dict) and c.get("wall_sec") is not None
    }
    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "pyfiles_import": pkg_file,
                "pages": n,
                "clusters": n_clusters,
                "sec": round(dt, 2),
                "docs_per_sec": round(n / dt, 2),
                "stage_walls": walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
