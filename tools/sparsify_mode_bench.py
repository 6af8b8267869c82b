"""Same-window decision bench: greedy_exact label reuse vs second CC.

The flagship's greedy_exact path can get its post-sparsify component
labels two ways: (A+B) plain greedy kernel + a second distributed CC
fixed point over the kept edges, or (C) the labels-mode kernel that
emits exact subcomponent labels in the same pass. Cross-window pipeline
runs disagreed within tenant noise, so this bench times all three terms
in ONE process on ONE synthetic edge set shaped like the real workload
(millions of tiny weighted components + one entity per component —
per-group pandas overhead dominated, like the 3.3M-page corpus).

Verdict rule: label reuse wins iff C < A + B in the same window.

Usage: ``python tools/sparsify_mode_bench.py [n_edges_millions]``
(default 3, ≈ the 1M-entity corpus's edge volume).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN_LEN = 4  # nodes per component → 3 edges each


def main() -> None:
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    n_edges = int(n_m * 1_000_000)
    from pyspark.sql import functions as F

    from biomedical_entity_linking_spark.operators.connected_components import (
        connected_components,
    )
    from biomedical_entity_linking_spark.operators.sparsify import (
        greedy_entity_partition,
    )
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name="sparsify-mode", cores=16)
    n_comp = n_edges // (CHAIN_LEN - 1)
    base = spark.range(0, n_comp)
    parts = []
    for i in range(CHAIN_LEN - 1):
        parts.append(
            base.select(
                F.xxhash64(F.col("id") * CHAIN_LEN + i).alias("rid_a"),
                F.xxhash64(F.col("id") * CHAIN_LEN + i + 1).alias("rid_b"),
                (F.pmod(F.xxhash64(F.col("id") + 31 * i), F.lit(1000))
                 / 1000.0 + 0.8).alias("weight"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionAll(p)
    edges = edges.repartition(64).persist()
    edges.count()
    ents = base.select(F.xxhash64(F.col("id") * CHAIN_LEN).alias("rid")).persist()
    ents.count()

    t0 = time.time()
    kept_plain = greedy_entity_partition(edges, ents).persist()
    nk = kept_plain.count()
    t_a = time.time() - t0

    t0 = time.time()
    labels_cc, iters = connected_components(kept_plain, src="rid_a", dst="rid_b")
    nl_cc = labels_cc.count()
    t_b = time.time() - t0

    t0 = time.time()
    _, labels_kernel = greedy_entity_partition(edges, ents, return_labels=True)
    nl_k = labels_kernel.count()
    t_c = time.time() - t0

    assert nl_cc == nl_k, (nl_cc, nl_k)
    print(json.dumps({
        "edges": n_edges, "components": n_comp, "kept_edges": nk,
        "labeled_nodes": nl_k, "cc_iterations": iters,
        "A_plain_kernel_sec": round(t_a, 2),
        "B_second_cc_sec": round(t_b, 2),
        "C_labels_kernel_sec": round(t_c, 2),
        "label_reuse_wins": bool(t_c < t_a + t_b),
        "delta_sec": round((t_a + t_b) - t_c, 2),
    }))


if __name__ == "__main__":
    main()
