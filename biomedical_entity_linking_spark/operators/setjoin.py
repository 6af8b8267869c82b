"""Exact set-similarity join via prefix filtering (PPJoin-style).

The engine's other near-dup candidate generators trade recall for
boundedness (``dedup.ngram_jaccard_neardup`` drops tokens above a df
cap; MinHash/SimHash are probabilistic). This operator is the EXACT
complement: every pair with token-set Jaccard ≥ τ is returned, no
false negatives, no cap drops — the prefix-filtering guarantee of the
set-similarity-join literature (Chaudhuri et al. 2006 SSJoin; Xiao et
al. 2008 PPJoin), relational from end to end:

1. global canonical token order: ascending document frequency (rarest
   first), ties by token — the order that makes prefixes maximally
   selective;
2. prefix: the first ``|t| − ⌈τ·|t|⌉ + 1`` tokens of each doc in that
   order. THEOREM: two sets whose prefixes are disjoint have Jaccard
   < τ (J ≥ τ forces |a∩b| ≥ ⌈τ/(1+τ)·(|a|+|b|)⌉, and the pigeonhole
   then puts a shared token inside both prefixes), so an inverted
   index over PREFIX tokens alone generates every qualifying pair;
3. length filter inside the candidate join (J ≥ τ bounds the size
   ratio to [τ, 1/τ]);
4. exact verify: |a∩b| via ``array_intersect`` cardinality, kept when
   ``inter · den ≥ num · union`` — the threshold τ = num/den applied
   as INTEGER cross-multiplication, no float anywhere, so the DuckDB
   brute-force all-pairs oracle matches hash-exactly.

Input: the ``documents`` table's text is drawn from one small shared
vocabulary, which makes its PAIRWISE Jaccard distribution degenerate
for any similarity join (measured at sf0.01: 57% of ALL doc pairs have
token-set J ≥ 0.6, 7% ≥ 0.9 — the output itself is quadratic, so
nothing can prune). Like ``weburl._noisy_urls`` and ``linkgraph``'s
link relation, the token sets are therefore SYNTHESIZED
deterministically from doc_id — 5 corpus-hot tokens shared by every
doc (the df head the canonical order must push OUT of prefixes), one
per-doc salt token, and 35 pair-private tokens shared by the (2m,
2m+1) doc pair, giving each planted pair J = 40/42 ≈ 0.952 ≥ τ and
every other pair J = 5/77 — the generator is mirrored verbatim in the
oracle SQL, so the value-hash certifies the JOIN (ordering, prefix
math, candidate generation, verify), not the generator.

Scale shape (100 TB): the inverted index is keyed by each doc's RAREST
tokens — the tokens with the shortest postings lists (here df ≤ 2, the
hot df-500 head never enters a prefix); the candidate join shuffles
(token → posting) pairs, never all pairs, and the verify step touches
only candidates. The contract is exactness with no silent drops; when
a corpus needs a recall/cost trade instead, that is
``ngram_jaccard_neardup``'s df-capped contract.

Reference analog: the reference's candidate generator retrieves by
rarest-first TF-IDF char-gram weights (``candidate_generation.py:49``)
— the same rarity heuristic, approximate top-k; this operator is the
exact-join counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# τ = 0.95 as an integer ratio (cross-multiplied, never divided)
TAU_NUM, TAU_DEN = 19, 20
N_HOT = 5
N_PAIR = 35
_SALT_BASE = 1_000_000
_PAIR_BASE = 2_000_000


def _token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, tok bigint): the deterministic planted sets."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    hot = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(N_HOT - 1))).alias("j")
    ).select("doc_id", F.col("j").cast("bigint").alias("tok"))
    salt = docs.select(
        "doc_id", (F.lit(_SALT_BASE) + F.col("doc_id")).alias("tok")
    )
    pair = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_PAIR - 1))).alias("j"),
    ).select(
        "doc_id",
        (
            F.lit(_PAIR_BASE)
            + F.expr("doc_id div 2") * N_PAIR  # integer div — never float
            + F.col("j")
        ).alias("tok"),
    )
    return hot.unionByName(salt).unionByName(pair)


def prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_a, doc_b, inter, uni) for all pairs with
    token-set Jaccard ≥ τ, doc_a < doc_b — EXACT (no false negatives).
    """
    return prefix_jaccard_over(_token_sets(spark, sf_dir))


def prefix_jaccard_over(
    toks: DataFrame, num: int = TAU_NUM, den: int = TAU_DEN
) -> DataFrame:
    """Generic core over ANY distinct (doc_id, tok) relation: the exact
    τ = num/den set-similarity self-join (prefix filter + length filter
    + integer-cross-multiplied verify)."""
    # token relation referenced 3x (df agg + rank join + set collect),
    # prefix and sets 2x each (self-join / verify sides): lazy
    # localCheckpoints materialize each once per query (36 parquet scans
    # in the r5 sf0.1 plan otherwise)
    toks = toks.localCheckpoint(eager=False)
    df_order = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = (
        toks.join(df_order, "tok")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("tok").asc()
                )
            ),
        )
        .withColumn(
            "sz", F.count("*").over(Window.partitionBy("doc_id"))
        )
    )
    # prefix length = sz − ceil(τ·sz) + 1; integer ceil = (sz·num+den−1) div den
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz")
        - F.expr(f"(sz * {num} + {den} - 1) div {den}")
        + F.lit(1)
    ).select("tok", "doc_id", "sz").localCheckpoint(eager=False)
    sets = toks.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("tok")).alias("toks")
    ).localCheckpoint(eager=False)
    a = prefix.select(
        "tok", F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        "tok", F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")
    )
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.col("sz_b") * den >= F.col("sz_a") * num)
        .filter(F.col("sz_a") * den >= F.col("sz_b") * num)
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("inter"),
            (
                F.size("toks_a") + F.size("toks_b")
                - F.size(F.array_intersect("toks_a", "toks_b"))
            ).alias("uni"),
        )
        .filter(F.col("inter") * den >= F.lit(num) * F.col("uni"))
    )
    return verified.orderBy("doc_a", "doc_b")


PREFIX_JACCARD_SQL = f"""
WITH d AS (SELECT doc_id FROM documents),
toks AS (
  SELECT doc_id, CAST(j AS BIGINT) AS tok
  FROM d, range({N_HOT}) r(j)
  UNION ALL
  SELECT doc_id, {_SALT_BASE} + doc_id AS tok FROM d
  UNION ALL
  SELECT doc_id,
         {_PAIR_BASE} + (doc_id // 2) * {N_PAIR} + j AS tok
  FROM d, range({N_PAIR}) r(j)
),
sets AS (SELECT doc_id, CAST(count(*) AS INT) AS sz FROM toks GROUP BY doc_id),
-- brute-force oracle: ALL pairs sharing any token, exact Jaccard,
-- integer cross-multiply (certifies the Spark side's prefix+verify
-- pipeline found every qualifying pair and nothing else)
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS INT) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.inter,
       CAST(sa.sz + sb.sz - i.inter AS INT) AS uni
FROM inter i
JOIN sets sa ON sa.doc_id = i.doc_a
JOIN sets sb ON sb.doc_id = i.doc_b
WHERE i.inter * {TAU_DEN} >= {TAU_NUM} * (sa.sz + sb.sz - i.inter)
ORDER BY doc_a, doc_b
"""
