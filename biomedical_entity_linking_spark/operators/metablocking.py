"""Meta-blocking: prune the blocking graph before a single pair is
scored (Papadakis et al., TKDE 2013) — CBS edge weighting + the
node-centric WNP pruning rule, relational end to end.

The engine's other blocking ops either EVALUATE rules
(``multipass_blocking`` prices rule unions without materializing
pairs) or GENERATE candidates (LSH bands, segment pigeonholes). This
operator sits between them: token blocking produces a candidate edge
list whose quadratic hot tail is the cost driver at 10^12 docs;
meta-blocking's observation is that the BLOCKING GRAPH ITSELF carries
signal — pairs sharing many blocks are likelier matches — so weight
every candidate edge by CBS (Common Blocks Scheme: the number of
blocks the pair co-occurs in) and keep, per node, only edges at or
above that node's mean weight (Weighted Node Pruning; the union over
both endpoints, per the redefined node-centric rule). Matches survive,
the cross-product residue drops, and NOTHING here computes a string
similarity — the prune is pure graph structure.

Relational shape, all integer:

1. block purging: tokens with df < 2 (no pairs) or df > ``MAX_DF``
   (the hot head — same cap contract as ``ngram_jaccard_neardup``)
   drop before any join;
2. edges: posting-list self-join (a < b) → ONE map-side-combinable
   count per pair = CBS;
3. WNP: symmetrize, per-node degree and weight-sum via two window
   sums over one exchange, keep ``w · deg_u ≥ sum_w_u`` — the mean
   comparison CROSS-MULTIPLIED so no division exists to diverge;
4. an edge survives if EITHER endpoint retains it; dedupe back to
   (doc_a < doc_b).

Input: the documents table's shared-vocabulary text makes real token
blocks degenerate (every pair co-occurs — nothing to prune), so the
token relation is SYNTHESIZED deterministically from doc_id and
mirrored verbatim in the oracle (the ``setjoin``/``editjoin``
precedent): docs (2m, 2m+1) share 20 pair-private tokens (the true
match, CBS 20), docs (2m+1, 2m+2) share 6 chain tokens (the near-miss
the prune must drop: 6 < mean(20, 6) at BOTH endpoints), and 5 hot
tokens span the corpus (the df cap must purge them BEFORE the
posting join — the scale-critical step). The value-hash certifies the
purge + join + window pipeline, not the generator.

Scale shape (100 TB): postings after purging are ≤ MAX_DF long, so
the self-join emits ≤ df²/2 rows per block — bounded, never
all-pairs; the CBS count combines map-side; the WNP windows are two
passes over the symmetrized edge relation partitioned by node. Hot
nodes (a doc in many blocks) are the documented salting hatch.

Reference analog: none — the reference blocks per-mention against an
ontology; graph-side candidate pruning is the grafted ER tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

MAX_DF = 50
N_HOT = 5
N_PAIR = 20
N_CHAIN = 6
# disjoint at any doc count (pair ids grow 10·doc_id, chain ids
# 3·doc_id): 1e12-apart bases keep the ranges collision-free below
# ~1e11 docs — the containment generator's 1M-doc overlap lesson
_PAIR_BASE = 10_000_000_000_000
_CHAIN_BASE = 20_000_000_000_000


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, tok): the planted blocking-key relation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    hot = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_HOT - 1))).alias("j"),
    ).select("doc_id", F.col("j").cast("bigint").alias("tok"))
    pair = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_PAIR - 1))).alias("j"),
    ).select(
        "doc_id",
        (
            F.lit(_PAIR_BASE)
            + F.expr("doc_id div 2") * N_PAIR
            + F.col("j")
        ).alias("tok"),
    )
    # chain m links docs 2m+1 and 2m+2; doc 0 and the last odd doc sit
    # at chain ends
    chain = (
        docs.filter(F.col("doc_id") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(N_CHAIN - 1))).alias("j"),
            F.expr(
                "CASE WHEN doc_id % 2 = 1 THEN (doc_id - 1) div 2 "
                "ELSE doc_id div 2 - 1 END"
            ).alias("m"),
        )
        .select(
            "doc_id",
            (
                F.lit(_CHAIN_BASE) + F.col("m") * N_CHAIN + F.col("j")
            ).alias("tok"),
        )
    )
    return hot.unionByName(pair).unionByName(chain)


def metablocking_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the WNP-retained candidate edges (doc_a, doc_b,
    cbs) of the token blocking graph."""
    return metablocking_prune_over(_tokens(spark, sf_dir), MAX_DF)


def metablocking_prune_over(
    toks: DataFrame, max_df: int = MAX_DF
) -> DataFrame:
    """Generic core over ANY distinct (doc_id, tok) relation: block
    purging → CBS edges → WNP prune."""
    # toks referenced twice (df agg + purge join), kept twice (self-join
    # sides), edges twice (both directions of sym): lazy localCheckpoints
    # materialize each once per query (48 parquet scans in the r5 sf0.1
    # plan otherwise)
    toks = toks.localCheckpoint(eager=False)
    df_rel = toks.groupBy("tok").agg(F.count("*").alias("df"))
    kept = toks.join(
        df_rel.filter((F.col("df") >= 2) & (F.col("df") <= max_df)), "tok"
    ).select("tok", "doc_id").localCheckpoint(eager=False)
    a = kept.select("tok", F.col("doc_id").alias("doc_a"))
    b = kept.select("tok", F.col("doc_id").alias("doc_b"))
    edges = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("cbs"))
        .localCheckpoint(eager=False)
    )
    sym = edges.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"), "cbs"
    ).unionByName(
        edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"), "cbs")
    )
    w = Window.partitionBy("u")
    retained = (
        sym.select(
            "u",
            "v",
            "cbs",
            F.sum("cbs").over(w).alias("sum_w"),
            F.count("*").over(w).alias("deg"),
        )
        # w >= mean, cross-multiplied: no division to diverge
        .filter(F.col("cbs") * F.col("deg") >= F.col("sum_w"))
        .select(
            F.least("u", "v").alias("doc_a"),
            F.greatest("u", "v").alias("doc_b"),
            "cbs",
        )
        .distinct()
    )
    return retained.orderBy("doc_a", "doc_b")


_TOKENS_SQL = f"""
toks AS (
  SELECT doc_id, CAST(j AS BIGINT) AS tok
  FROM documents, range({N_HOT}) r(j)
  UNION ALL
  SELECT doc_id, {_PAIR_BASE} + (doc_id // 2) * {N_PAIR} + j AS tok
  FROM documents, range({N_PAIR}) r(j)
  UNION ALL
  SELECT doc_id,
         {_CHAIN_BASE}
           + (CASE WHEN doc_id % 2 = 1 THEN (doc_id - 1) // 2
                   ELSE doc_id // 2 - 1 END) * {N_CHAIN} + j AS tok
  FROM documents, range({N_CHAIN}) r(j)
  WHERE doc_id > 0
)"""

METABLOCKING_PRUNE_SQL = f"""
WITH {_TOKENS_SQL},
kept AS (
  SELECT tok, doc_id FROM toks
  WHERE tok IN (SELECT tok FROM toks GROUP BY tok
                HAVING count(*) BETWEEN 2 AND {MAX_DF})
),
edges AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS cbs
  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sym AS (
  SELECT doc_a AS u, doc_b AS v, cbs FROM edges
  UNION ALL
  SELECT doc_b AS u, doc_a AS v, cbs FROM edges
),
scored AS (
  SELECT u, v, cbs,
         sum(cbs) OVER (PARTITION BY u) AS sum_w,
         count(*) OVER (PARTITION BY u) AS deg
  FROM sym
)
SELECT DISTINCT least(u, v) AS doc_a, greatest(u, v) AS doc_b, cbs
FROM scored
WHERE cbs * deg >= sum_w
ORDER BY doc_a, doc_b
"""
