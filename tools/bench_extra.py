"""Extra per-query noop-sink timing (guide §1.4) — NOT the frozen driver
bench. Times a named subset of declared queries with N repeats each in one
session, reporting all samples + min. Used for before/after evidence in
OPTIMIZATION_r06.md; the headline number stays bench.py's.

Usage: python tools/bench_extra.py [-n REPEATS] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    names = args

    import __spark_entry__ as entry_mod
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name="bench_extra_r6", cores=CPUS)
    # warm the page cache exactly as bench.py does
    import glob

    for table in sorted(glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        spark.read.parquet(table).write.format("noop").mode("overwrite").save()

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()  # no cross-repeat cache reuse
        out[name] = {"samples": samples, "min": min(samples)}
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
