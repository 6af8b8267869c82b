"""Exact set-CONTAINMENT join via prefix filtering — the asymmetric
sibling of ``setjoin.prefix_jaccard_join``.

Symmetric Jaccard misses the commonest web-dup shape: a SHORT document
(a quote, a syndicated excerpt, a scraped fragment) contained in a
LONG one — J = |A∩B|/|A∪B| collapses as the size ratio grows even at
perfect containment. The containment join returns every ordered pair
with ``|A ∩ B| ≥ τ·|A|`` (containment of A in B), the predicate the
set-similarity literature treats as the third canonical threshold
beside Jaccard and cosine (Chaudhuri et al. 2006; the T-occurrence
family), and the one a syndication/quotation detector actually wants.

Relational construction, exact (zero false negatives):

1. canonical rarest-first token order (ascending df, ties by token) —
   shared with the Jaccard join;
2. LEFT prefix: the first ``|A| − ⌈τ·|A|⌉ + 1`` tokens of A. THEOREM:
   if fewer than that many of A's tokens could miss B yet containment
   held, some prefix token of A is in B — so an index over B's FULL
   token relation probed by A's prefix alone generates every
   qualifying pair. The asymmetry is the point: no length filter, no
   prefix on B (B may be arbitrarily larger), so the probe side is
   O(prefix·|A|) and the index side is the raw posting relation with
   the SAME df-hot-head caveat as every inverted index here (the df
   cap / salting hatches apply when B's postings skew);
3. exact verify: ``size(array_intersect) · den ≥ num · size(A)`` —
   integer cross-multiplication, no float anywhere, so the brute-force
   all-pairs DuckDB oracle matches hash-exactly.

Input: like ``setjoin``, pairwise containment over the shared-vocab
documents text is degenerate, so the token sets are SYNTHESIZED
deterministically and mirrored in the oracle: doc 3m is a LONG host
(40 private tokens + the 12-token "quote" block of group m), doc 3m+1
is the SHORT quoted fragment (those 12 tokens + 2 private salts →
containment 12/14 ≈ 0.857 ≥ τ = 5/6 in B=3m, NOT the reverse), and
doc 3m+2 is unrelated noise (14 private tokens). The hash certifies
ordering, prefix math, probe/index asymmetry, and verify.

Scale shape (100 TB): probe rows = prefix tokens of the SMALL side
only; candidates = probe ⋈ posting equi-join; verify touches
candidates. The output is ordered pairs (container ≠ containee roles
preserved) — exactly what a "which page quotes which" report needs.

Reference analog: none — exact containment joins are the grafted
dedup tier (syndication/quotation detection on crawl text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# τ = 5/6 as an integer ratio (cross-multiplied, never divided)
TAU_NUM, TAU_DEN = 5, 6
N_QUOTE = 12
N_HOST_PRIV = 40
N_SALT = 2
N_NOISE = 14
# token-id ranges must stay disjoint at ANY doc count — quote ids grow
# as (doc_id div 3)·N_QUOTE and private ids as doc_id·64, so the bases
# sit 1e12 apart (collision-free below ~15e9 docs; a 1M-doc campaign
# with 1e6/2e6 bases measurably overlapped and minted spurious pairs)
_QUOTE_BASE = 1_000_000_000_000
_PRIV_BASE = 2_000_000_000_000


def _token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, tok): host/fragment/noise planted sets."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    m = F.expr("doc_id div 3")
    role = F.col("doc_id") % 3
    quote = (
        docs.filter(role < 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(N_QUOTE - 1))).alias("j"),
        )
        .select(
            "doc_id",
            (F.lit(_QUOTE_BASE) + m * N_QUOTE + F.col("j")).alias("tok"),
        )
    )
    n_priv = (
        F.when(role == 0, F.lit(N_HOST_PRIV))
        .when(role == 1, F.lit(N_SALT))
        .otherwise(F.lit(N_NOISE))
    )
    priv = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_priv - 1)).alias("j"),
    ).select(
        "doc_id",
        (F.lit(_PRIV_BASE) + F.col("doc_id") * 64 + F.col("j")).alias("tok"),
    )
    return quote.unionByName(priv)


def containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_a, doc_b, inter, sz_a) for every ORDERED pair
    with |A∩B| ≥ τ·|A|, a ≠ b — EXACT, asymmetric (a contained in b).
    """
    return containment_join_over(_token_sets(spark, sf_dir))


def containment_join_over(
    toks: DataFrame, num: int = TAU_NUM, den: int = TAU_DEN
) -> DataFrame:
    """Generic core over ANY distinct (doc_id, tok) relation: the
    exact τ = num/den containment join (A-side prefix probe against
    the full posting index + integer cross-multiplied verify)."""
    # token relation referenced 4x (df agg, rank join, posting index,
    # set collect) and sets 2x: lazy localCheckpoints materialize each
    # once per query (20 parquet scans in the r5 sf0.1 plan otherwise)
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
        .withColumn("sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    # prefix length = sz − ceil(τ·sz) + 1; integer ceil = (sz·num+den−1) div den
    probe = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.expr(f"(sz * {num} + {den} - 1) div {den}") + 1
    ).select("tok", F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    index = toks.select("tok", F.col("doc_id").alias("doc_b"))
    cand = (
        probe.join(index, "tok")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "sz_a")
        .distinct()
    )
    sets = toks.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("tok")).alias("toks")
    ).localCheckpoint(eager=False)
    return (
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
            F.col("sz_a").cast("int").alias("sz_a"),
        )
        .filter(F.col("inter") * den >= F.lit(num) * F.col("sz_a"))
        .orderBy("doc_a", "doc_b")
    )


CONTAINMENT_JOIN_SQL = f"""
WITH d AS (SELECT doc_id FROM documents),
toks AS (
  SELECT doc_id, {_QUOTE_BASE} + (doc_id // 3) * {N_QUOTE} + j AS tok
  FROM d, range({N_QUOTE}) r(j)
  WHERE doc_id % 3 < 2
  UNION ALL
  SELECT doc_id, {_PRIV_BASE} + doc_id * 64 + j AS tok
  FROM d, range({N_HOST_PRIV}) r(j)
  WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, {_PRIV_BASE} + doc_id * 64 + j AS tok
  FROM d, range({N_SALT}) r(j)
  WHERE doc_id % 3 = 1
  UNION ALL
  SELECT doc_id, {_PRIV_BASE} + doc_id * 64 + j AS tok
  FROM d, range({N_NOISE}) r(j)
  WHERE doc_id % 3 = 2
),
sets AS (SELECT doc_id, CAST(count(*) AS INT) AS sz FROM toks GROUP BY doc_id),
-- brute-force oracle: ALL ordered pairs sharing any token, exact
-- containment of A in B, integer cross-multiply
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS INT) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.inter, sa.sz AS sz_a
FROM inter i
JOIN sets sa ON sa.doc_id = i.doc_a
WHERE i.inter * {TAU_DEN} >= {TAU_NUM} * sa.sz
ORDER BY doc_a, doc_b
"""
