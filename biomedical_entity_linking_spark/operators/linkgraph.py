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
    # materialize the static relations once; localCheckpoint each
    # iteration's rank to cut lineage (5 nested join trees re-evaluate
    # the whole prefix otherwise) — same move as connected_components.
    # outdeg is FOLDED INTO the edge relation up front (it never changes),
    # so each round pays ONE join instead of two; pre-hashing the weighted
    # edges on src lets every round's rank⋈edges sort-merge reuse the
    # edge side's layout (LogicalRDD keeps the partitioning through the
    # checkpoint) — measured 56.3 → see BENCH.md graph section
    n_parts = spark.sparkContext.defaultParallelism * 2
    edges_w = (
        edges.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .repartition(n_parts, "src")
        .localCheckpoint(eager=True)
    )
    base = base.repartition(n_parts, "doc_id").localCheckpoint(eager=True)
    rank = base.select("doc_id", F.col("base_q").alias("rank_q"))
    for it in range(N_ITER):
        contrib = (
            rank.withColumnRenamed("doc_id", "src")
            .join(edges_w, "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("rank_q div outdeg").alias("c"),
                F.lit(0).cast("long").alias("b"),
            )
        )
        # r6: the teleport term rides the SAME aggregation as the inflow
        # sum — base rows union in as (c=0, b=base_q) and one groupBy
        # yields both sums, replacing the r5 per-round base⋈inflow left
        # join (sorts + coalesce) with zero extra shuffles. sum(b) is
        # exactly base_q (one base row per node), sum(c) is exactly the
        # old coalesce(inflow, 0) (no contrib rows → empty sum over the
        # union group's c zeros) — integer arithmetic unchanged, so the
        # ranks stay bit-identical to the oracle.
        rank = (
            contrib.unionByName(
                base.select(
                    "doc_id",
                    F.lit(0).cast("long").alias("c"),
                    F.col("base_q").alias("b"),
                )
            )
            .groupBy("doc_id")
            .agg(
                F.expr(
                    f"({100 - DAMP_NUM} * sum(b)"
                    f" + {DAMP_NUM} * sum(c)) div {DAMP_DEN}"
                ).alias("rank_q")
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
SELECT doc_id, CAST(rank_q AS BIGINT) AS rank_q FROM it{N_ITER}
ORDER BY rank_q DESC, doc_id ASC
"""


PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# Triangle counting — degree-ordered edge orientation
# --------------------------------------------------------------------------

def _undirected(edges: DataFrame) -> DataFrame:
    """Directed link relation → distinct undirected (u < v) edge set."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, tri_cnt): per-node triangle participation.

    Triangle counting over the same synthesized link relation PageRank
    iterates (``_LINK_EXPRS``): clique-ish neighborhoods in a link graph
    are a dup-farm / mirror-network signal a crawl pipeline scores
    alongside centrality. The naive triangle join is cubic in hub
    degree, so this uses the standard at-scale construction —
    **degree-ordered orientation**: orient every undirected edge from
    the endpoint with the smaller ``(degree, id)`` total-order key to
    the larger, then count wedges only at each edge's LOW endpoint and
    close them with one equi-join. Every out-neighborhood is then
    O(√m)-bounded regardless of hub in-degree (a node with out-degree d
    in the oriented graph has d neighbors of degree ≥ its own, so
    d ≤ √(2m)) — the planted ~N/97-in-degree hubs become wedge TARGETS,
    never wedge sources, and the quadratic wedge stage never explodes.

    Cross-engine exactness: the total-order key is the INTEGER
    ``degree · n_docs + node_id`` (collision-free since id < n_docs),
    and every downstream step is integer comparison / count — no floats
    anywhere, so the value-hash is bit-exact vs the oracle.

    Scale shape (100 TB): degree agg = one map-side-combinable count
    shuffle; orientation = two id-keyed joins; the wedge self-join
    shuffles on the low endpoint whose group width is the √(2m) bound
    above; the closing join is an equi-join on the (b, c) pair key.
    Nothing is quadratic in the hot key, and no stage holds more than
    one edge's constant payload per row.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_rel = docs.agg(F.count("*").alias("n_docs"))
    und = _undirected(_edges(docs)).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    keyed = deg.join(F.broadcast(n_rel)).select(
        "node", (F.col("deg") * F.col("n_docs") + F.col("node")).alias("k")
    )
    ku = keyed.select(F.col("node").alias("u"), F.col("k").alias("ku"))
    kv = keyed.select(F.col("node").alias("v"), F.col("k").alias("kv"))
    oriented = (
        und.join(ku, "u")
        .join(kv, "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("a"),
            F.when(F.col("ku") < F.col("kv"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("b"),
            F.greatest("ku", "kv").alias("kb"),
        )
    ).localCheckpoint(eager=True)
    e1 = oriented.select(
        F.col("a"), F.col("b").alias("w1"), F.col("kb").alias("k1")
    )
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("w2"), F.col("kb").alias("k2")
    )
    wedges = e1.join(e2, "a").filter(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("a").alias("w1"), F.col("b").alias("w2")
    )
    tris = wedges.join(closing, ["w1", "w2"]).select(
        F.col("a").alias("n1"), F.col("w1").alias("n2"), F.col("w2").alias("n3")
    )
    per_node = (
        tris.select(
            F.explode(F.array("n1", "n2", "n3")).alias("doc_id")
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("tri_cnt"))
    )
    return per_node.orderBy(F.col("tri_cnt").desc(), F.col("doc_id").asc())


def _triangle_count_sql() -> str:
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src, {expr} AS dst FROM t, n_rel"
        for expr in _LINK_EXPRS
    )
    return f"""
WITH t AS (SELECT doc_id FROM documents),
n_rel AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
edges AS (SELECT src, dst FROM ({links}) WHERE src != dst),
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
        ) GROUP BY node),
keyed AS (SELECT node, deg * n_docs + node AS k FROM deg, n_rel),
oriented AS (
  SELECT CASE WHEN ku.k < kv.k THEN und.u ELSE und.v END AS a,
         CASE WHEN ku.k < kv.k THEN und.v ELSE und.u END AS b,
         greatest(ku.k, kv.k) AS kb
  FROM und
  JOIN keyed ku ON ku.node = und.u
  JOIN keyed kv ON kv.node = und.v
),
tris AS (
  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
  FROM oriented e1
  JOIN oriented e2 ON e1.a = e2.a AND e1.kb < e2.kb
  JOIN oriented c ON c.a = e1.b AND c.b = e2.b
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
  SELECT n1 AS doc_id FROM tris
  UNION ALL SELECT n2 FROM tris
  UNION ALL SELECT n3 FROM tris
) GROUP BY doc_id
ORDER BY tri_cnt DESC, doc_id ASC
"""


TRIANGLE_COUNT_SQL = _triangle_count_sql()


# --------------------------------------------------------------------------
# Label propagation — deterministic synchronous community detection
# --------------------------------------------------------------------------

LPA_ITER = 4


def _lpa(nodes: DataFrame, und: DataFrame, n_parts: int) -> DataFrame:
    """(node) × undirected (u,v) → (node, community) after LPA_ITER
    synchronous rounds. Vote = most frequent label over the CLOSED
    neighborhood (neighbors + the node's own current label — the
    self-vote), tie → smallest label; nodes with no neighbors keep
    their own label.

    The self-vote is load-bearing, not a variant choice: synchronous
    neighbor-ONLY voting provably 2-cycles on bipartite structure (an
    edge pair swaps labels forever, a star blinks center↔leaves —
    both reproduced in ``tests/test_label_propagation.py`` during
    development), while the closed neighborhood damps the oscillation
    and converges on the same planted shapes.

    Deterministic by construction: votes are integer counts over a
    SIMPLE graph (the distinct undirected edge set), and the winner is
    the unique first row of the (count DESC, label ASC) total order per
    node — no RNG, no update-order dependence (synchronous rounds), so
    both engines land on identical labelings. Classic async LPA
    tie-breaks randomly; the deterministic variant is what a
    reproducible 100 TB pipeline can actually ship.

    Scale shape: per round one equi-join (neighbor → current label,
    keyed by peer) + one (node,label) count agg (map-side combinable —
    a hub's votes collapse per partition before the shuffle) + one
    per-node ``max_by`` argmax agg. The winner per node is ``max_by(
    label, struct(c, -label))`` — the unique maximum of the ``(count
    ASC, -label ASC)`` struct order is exactly the first row of the
    previous window formulation's ``(count DESC, label ASC)`` total
    order, but as a partially-aggregatable agg instead of a
    sort-the-whole-partition window. The closed-neighborhood self-vote
    guarantees EVERY node has ≥1 vote row, so the winner relation is
    already total — the r5 left-join of winners back onto the label
    relation (plus its coalesce and repartition barrier) was a no-op
    and is gone: one join + two aggs per round, nothing else. Rounds
    are ``localCheckpoint``-ed like ``pagerank``'s to cut the growing
    join lineage. Hub skew lands on the vote agg's (node,label) key,
    bounded by the node's DISTINCT neighbor-label count, which LPA
    itself shrinks every round."""
    nbr = (
        und.select(F.col("u").alias("node"), F.col("v").alias("peer"))
        .unionByName(
            und.select(F.col("v").alias("node"), F.col("u").alias("peer"))
        )
        .unionByName(  # the self-vote: every node is its own peer
            nodes.select(
                F.col("doc_id").alias("node"),
                F.col("doc_id").alias("peer"),
            )
        )
        .repartition(n_parts, "peer")
        .localCheckpoint(eager=True)
    )
    labels = (
        nodes.select(
            F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
        )
        .repartition(n_parts, "node")
        .localCheckpoint(eager=True)
    )
    for _ in range(LPA_ITER):
        votes = (
            nbr.join(
                labels.select(
                    F.col("node").alias("peer"), F.col("label")
                ),
                "peer",
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.max_by(
                    "label", F.struct(F.col("c"), (-F.col("label")))
                ).alias("label")
            )
            .repartition(n_parts, "node")
            .localCheckpoint(eager=True)
        )
    return labels


def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, community) after 4 deterministic synchronous
    LPA rounds over the synthesized link graph (same ``_LINK_EXPRS``
    relation PageRank and triangle counting iterate) — the third member
    of the graph family: CC finds connectivity, PageRank ranks it, LPA
    finds the DENSE regions inside it (link farms, mirror networks,
    template clusters in a crawl graph)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    und = _undirected(_edges(docs))
    n_parts = spark.sparkContext.defaultParallelism * 2
    labels = _lpa(docs.select("doc_id"), und, n_parts)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    ).orderBy("doc_id")


def _lpa_sql() -> str:
    links = " UNION ALL ".join(
        f"SELECT doc_id AS src, {expr} AS dst FROM t, n_rel"
        for expr in _LINK_EXPRS
    )
    parts = [
        f"""t AS (SELECT doc_id FROM documents),
n_rel AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
edges AS (SELECT src, dst FROM ({links}) WHERE src != dst),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM edges
),
nbr AS (
  SELECT u AS node, v AS peer FROM und
  UNION ALL SELECT v AS node, u AS peer FROM und
  UNION ALL SELECT doc_id AS node, doc_id AS peer FROM t
),
l0 AS (SELECT doc_id AS node, doc_id AS label FROM t)"""
    ]
    for i in range(1, LPA_ITER + 1):
        parts.append(
            f"""v{i} AS (
  SELECT n.node, l.label, count(*) AS c
  FROM nbr n JOIN l{i - 1} l ON n.peer = l.node
  GROUP BY n.node, l.label
),
w{i} AS (
  SELECT node, label
  FROM v{i}
  QUALIFY row_number() OVER (
    PARTITION BY node ORDER BY c DESC, label ASC) = 1
),
l{i} AS (
  SELECT p.node, COALESCE(w.label, p.label) AS label
  FROM l{i - 1} p LEFT JOIN w{i} w ON p.node = w.node
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT node AS doc_id, label AS community
FROM l{LPA_ITER}
ORDER BY doc_id
"""


LABEL_PROPAGATION_SQL = _lpa_sql()
