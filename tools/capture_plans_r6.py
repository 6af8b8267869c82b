"""Capture .explain("formatted") output for declared queries into
plans/r06/<query>_{before,after}.txt (optimization-round evidence).

Usage: python tools/capture_plans_r6.py before q1 q2 ...
       python tools/capture_plans_r6.py after  q1 q2 ...
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), tag

    import __spark_entry__ as entry_mod
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name=f"plans_r6_{tag}")
    out_dir = os.path.join(ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(
            f"{name}: wrote {path} | Exchange={n_exchange} "
            f"SMJ={plan.count('SortMergeJoin')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"Scans={plan.count('Scan parquet')}"
        )


if __name__ == "__main__":
    main()
