"""Link-graph analysis: fixed-iteration PageRank as relational algebra.

A crawl pipeline ranks its frontier: which of 10^12 pages to fetch,
keep, or re-crawl first is a link-centrality question, and PageRank is
the canonical answer. This module expresses the power iteration as
pure DataFrame algebra — per iteration ONE join (rank → out-edges) and
ONE groupBy-sum on the destination key — the same shape as the
engine's connected-components rounds (``operators/
connected_components``), but with weighted numeric state instead of
min-label state. Reference analog: the reference's graph stage builds
and iterates over a candidate graph (``eval_cluster_linking.py:
130-146`` components; ``special_partition`` edge ordering); PageRank is
the weighted sibling the web tier needs.

Cross-engine exactness: PageRank's groupBy-sum of double contributions
is addition-order-dependent — unhashable across engines. So rank mass
is carried as INTEGER micro-units (``RANK_SCALE = 10^12`` total mass,
int64-safe for any test N) and every step is integer arithmetic:
``contrib = rank div out_degree``, ``rank' = (15·base + 85·inflow) div
100``. Integer sums are exact and order-independent, ``div`` truncates
identically in both engines (operands non-negative), so after any
number of iterations the ranks match bit-for-bit. The deliberate cost:
``div`` drops sub-unit remainders (≤ out_degree·5 micro-units per node
per iteration of leaked mass — at 10^-12 granularity, noise), which is
the standard fixed-point trade and is IDENTICAL in both engines.

The ``documents`` table has no link column, so — like
``weburl._noisy_urls`` — the edge relation is SYNTHESIZED
deterministically from doc_id residues (three out-links per page —
quadratic, affine-permutation, and hub, see ``_LINK_EXPRS`` — modulo
the corpus size, self-loops dropped), mirrored verbatim in the oracle
SQL: the value-hash certifies the ITERATION, not the generator.

Scale shape (100 TB): per iteration one shuffle keyed by dst — in-link
skew (a page every crawl links to; planted here via the hub link) is
the hot-key axis, and the groupBy-SUM absorbs it map-side (partial_sum
combines hub contributions per partition BEFORE the shuffle, so the hot
key ships one row per upstream partition — the same reason A6-style
count aggregates never need salting); the rank relation is
``localCheckpoint``-ed per round exactly as ``connected_components``
rounds are, cutting the otherwise re-evaluated 5-deep join lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ITER = 5
RANK_SCALE = 1_000_000_000_000  # total rank mass in micro-units (int64)
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an integer ratio
# three out-links per page, chosen for a NON-uniform in-degree profile
# (a permutation link alone would make PageRank degenerate-uniform):
# a quadratic link (irregular quadratic-residue multiplicities), one
# affine permutation (keeps the graph strongly connected), and a hub
# link (pages 0..96 collect ~N/97 in-links each — the web's hot-key
# shape, the thing the per-iteration dst shuffle must survive)
_LINK_EXPRS = (
    "(doc_id * doc_id + 1) % n_docs",
    "(7 * doc_id + 3) % n_docs",
    "(doc_id % 97) % n_docs",
)


def _edges(docs: DataFrame) -> DataFrame:
    """(src, dst) — deterministic residue links, self-loops dropped."""
    n_rel = docs.agg(F.count("*").alias("n_docs"))
    with_n = docs.select("doc_id").join(F.broadcast(n_rel))
    parts = [
        with_n.select(
            F.col("doc_id").alias("src"), F.expr(expr).alias("dst")
        )
        for expr in _LINK_EXPRS
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return e.filter(F.col("src") != F.col("dst"))


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, rank_q) after 5 integer-exact PR iterations.

    rank_q is the node's rank mass in micro-units (Σ ≈ RANK_SCALE up to
    truncation leakage); callers divide by RANK_SCALE for probabilities.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nodes = docs.select("doc_id")
    n_rel = nodes.agg(F.count("*").alias("n_docs"))
    edges = _edges(docs)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # every node links out by construction (self-loop drop leaves ≥2),
    # so there is no dangling-mass term
    base = nodes.join(F.broadcast(n_rel)).select(
        "doc_id", F.expr(f"{RANK_SCALE} div n_docs").alias("base_q")
    )
    # materialize the small static relations once; localCheckpoint each
    # iteration's rank to cut lineage (5 nested join trees re-evaluate
    # the whole prefix otherwise) — same move as connected_components
    edges = edges.localCheckpoint(eager=True)
    outdeg = outdeg.localCheckpoint(eager=True)
    base = base.localCheckpoint(eager=True)
    rank = base.select("doc_id", F.col("base_q").alias("rank_q"))
    for it in range(N_ITER):
        contrib = (
            rank.join(outdeg, rank["doc_id"] == outdeg["src"])
            .join(edges, "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("rank_q div outdeg").alias("c"),
            )
        )
        inflow = contrib.groupBy("doc_id").agg(F.sum("c").alias("inflow"))
        rank = (
            base.join(inflow, "doc_id", "left")
            .select(
                "doc_id",
                F.expr(
                    f"({100 - DAMP_NUM} * base_q"
                    f" + {DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}"
                ).alias("rank_q"),
            )
        )
        if it < N_ITER - 1:
            # cut lineage between rounds; the LAST round stays lazy so
            # the returned plan exposes one iteration's join+agg shape
            # to the plan audit (and composes with downstream operators)
            rank = rank.localCheckpoint(eager=True)
    return rank.orderBy(F.col("rank_q").desc(), F.col("doc_id").asc())


def _pr_iter_sql(prev: str, it: str) -> str:
    return f"""
{it} AS (
  SELECT b.doc_id,
         ({100 - DAMP_NUM} * b.base_q
          + {DAMP_NUM} * coalesce(i.inflow, 0)) // {DAMP_DEN} AS rank_q
  FROM base b LEFT JOIN (
    SELECT e.dst AS doc_id, sum(p.rank_q // o.outdeg) AS inflow
    FROM {prev} p
    JOIN outdeg o ON o.src = p.doc_id
    JOIN edges e ON e.src = p.doc_id
    GROUP BY e.dst
  ) i USING (doc_id)
)"""


def _pagerank_sql() -> str:
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src, {expr} AS dst FROM t, n_rel"
        for expr in _LINK_EXPRS
    )
    iters = ",".join(
        _pr_iter_sql("it0" if i == 0 else f"it{i}", f"it{i + 1}")
        for i in range(N_ITER)
    )
    return f"""
WITH t AS (SELECT doc_id FROM documents),
n_rel AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
edges AS (SELECT src, dst FROM ({links}) WHERE src != dst),
outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
           FROM edges GROUP BY src),
base AS (SELECT doc_id, ({RANK_SCALE} // n_docs) AS base_q FROM t, n_rel),
it0 AS (SELECT doc_id, base_q AS rank_q FROM base),
{iters}
SELECT doc_id, rank_q FROM it{N_ITER}
ORDER BY rank_q DESC, doc_id ASC
"""


PAGERANK_SQL = _pagerank_sql()
