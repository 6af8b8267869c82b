"""Exact edit-distance self-join via segment pigeonhole (PassJoin-style).

``setjoin.prefix_jaccard_join`` is the engine's exact join for SET
similarity; this operator is its STRING sibling: every pair of names
within Levenshtein distance ≤ D, no false negatives, relational end to
end — the partition-based signature scheme of the string-join
literature (Li, Deng, Feng 2011 "PassJoin"), simplified to the loose
(still exact) position bound:

1. partition every INDEXED name into D+1 contiguous segments (the even
   split: segment i of a length-L name starts at
   ``i·(L div k) + min(i, L mod k) + 1`` with k = D+1);
2. PIGEONHOLE THEOREM: ed(a, b) ≤ D means at most D edit operations
   touch b, and D ops cannot touch all D+1 segments — so at least one
   segment of b appears in a UNCHANGED, at a start position shifted by
   at most D (each insert/delete before it shifts it by one);
3. probe: each name a therefore emits, for every candidate partner
   length L ∈ [|a|−D, |a|+D], every segment index, and every shift in
   [−D, D], the substring of a at that (start, length) — a bounded
   (D+1)·(2D+1)² ≈ 18-row fan-out at D = 1, each row a SELECTIVE join
   key (half a near-unique name);
4. candidates = equi-join probe substrings against indexed segments on
   (segment index, partner length, segment string) — postings are
   bounded by near-duplicate group sizes, NEVER all pairs;
5. exact verify: built-in ``levenshtein`` ≤ D — certified bit-identical
   across Spark and DuckDB by ``incremental.incremental_linkage``'s
   oracle, so the brute-force all-pairs DuckDB oracle matches
   hash-exactly.

Input: like ``setjoin``, the documents table's shared-vocabulary text
is pairwise-degenerate for edit distance, so the names are SYNTHESIZED
deterministically from doc_id — docs (2m, 2m+1) share a 22-char hashed
hex name except the odd member has ONE character deleted (distance
exactly 1, and a VARIABLE-length pair, exercising the shift logic the
equal-length SimHash band join in ``dedup.py`` never can). The
generator is mirrored verbatim in the oracle SQL, so the value-hash
certifies the JOIN (partitioning math, probe fan-out, candidate
generation, verify), not the generator.

Scale shape (100 TB): index emits (D+1)·N rows, probe (D+1)(2D+1)²·N
rows, both linear; the one shuffle is the candidate equi-join keyed by
(seg_idx, partner_len, segment) whose postings scale with true
near-dup multiplicity; verify touches candidates only. A corpus whose
segment keys skew (boilerplate heads) takes the same salting escape
hatch as every hot-key join here (``functions/salting.py``).

Reference analog: none — the reference resolves against an ontology
with TF-IDF/neural candidates; exact bounded-edit-distance joins are
the grafted ER tier (dirty-key matching, e.g. typo'd titles/hosts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D = 1  # edit-distance threshold for the driver query
_H1_MUL = 2654435761
_H2_MUL = 40503
_MASK = (1 << 40) - 1  # 40-bit hashes → 10 hex chars each


def _names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, name): deterministic planted dirty keys."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    g = F.expr("doc_id div 2")
    h1 = F.lpad(
        F.format_string("%x", (g * _H1_MUL) % F.lit(_MASK + 1)), 10, "0"
    )
    h2 = F.lpad(
        F.format_string("%x", (g * _H2_MUL + 13) % F.lit(_MASK + 1)), 10, "0"
    )
    base = F.concat(F.lit("u"), h1, F.lit("v"), h2)  # length 22
    # odd member: delete ONE char at a group-dependent position 2..21
    p = (g % 20) + F.lit(2)
    dirty = F.concat(
        F.substring(base, F.lit(1), p - 1),
        base.substr(p + 1, F.lit(22)),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, base).otherwise(dirty).alias(
            "name"
        ),
    )


def edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_a, doc_b, dist) for all name pairs with
    Levenshtein distance ≤ D, doc_a < doc_b — EXACT (no false
    negatives)."""
    return edit_distance_join_over(_names(spark, sf_dir), d=D)


def edit_distance_join_over(names: DataFrame, d: int = 1) -> DataFrame:
    """Generic core over ANY (doc_id, name) relation: the exact
    Levenshtein-≤-d self-join (segment index + shifted-substring probe
    + built-in verify)."""
    k = d + 1
    # the name relation fans out 4 ways (segment index, shifted probe,
    # and both verify sides): one lazy localCheckpoint materializes the
    # generator subtree once per query instead of once per reference
    names = names.localCheckpoint(eager=False)
    base = names.select(
        "doc_id", "name", F.length("name").alias("n")
    )
    seg_i = F.col("seg_idx")
    # even-partition math: segment i of a length-L string starts at
    # i·(L div k) + min(i, L mod k) + 1 and has length
    # (L div k) + [i < L mod k] — `div` (not `/`) keeps it integer
    div = F.expr(f"n div {k}")
    idx = (
        base.select(
            "doc_id",
            "name",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("seg_idx"),
        )
        .select(
            F.col("doc_id").alias("id_b"),
            F.col("n").alias("len_b"),
            "seg_idx",
            F.col("name")
            .substr(
                seg_i * div + F.least(seg_i, F.col("n") % k) + 1,
                div + (seg_i < F.col("n") % k).cast("int"),
            )
            .alias("seg"),
        )
    )
    probe = (
        base.select(
            "doc_id",
            "name",
            "n",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("dl"),
        )
        .select(
            "doc_id",
            "name",
            "n",
            (F.col("n") + F.col("dl")).alias("len_b"),
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("seg_idx"),
        )
        .select(
            "doc_id",
            "name",
            "n",
            "len_b",
            "seg_idx",
            F.explode(F.sequence(F.lit(-d), F.lit(d))).alias("sh"),
        )
        .select(
            F.col("doc_id").alias("id_a"),
            "len_b",
            "seg_idx",
            (
                seg_i * F.expr(f"len_b div {k}")
                + F.least(seg_i, F.col("len_b") % k)
                + 1
                + F.col("sh")
            ).alias("p"),
            (
                F.expr(f"len_b div {k}")
                + (seg_i < F.col("len_b") % k).cast("int")
            ).alias("l"),
            "name",
            "n",
        )
        .filter((F.col("p") >= 1) & (F.col("p") + F.col("l") - 1 <= F.col("n")))
        .select(
            "id_a",
            "len_b",
            "seg_idx",
            F.col("name").substr(F.col("p"), F.col("l")).alias("seg"),
        )
    )
    cand = (
        probe.join(idx, ["seg_idx", "len_b", "seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
        )
        .distinct()
    )
    sides = names.select(
        F.col("doc_id"), F.col("name")
    )
    return (
        cand.join(
            sides.select(
                F.col("doc_id").alias("doc_a"), F.col("name").alias("name_a")
            ),
            "doc_a",
        )
        .join(
            sides.select(
                F.col("doc_id").alias("doc_b"), F.col("name").alias("name_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= d)
        .orderBy("doc_a", "doc_b")
    )


_NAMES_SQL = f"""
names AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN base
              ELSE substr(base, 1, p - 1) || substr(base, p + 1, 22)
         END AS name
  FROM (
    SELECT doc_id,
           'u' || lpad(printf('%x', ((doc_id // 2) * {_H1_MUL}) % {_MASK + 1}), 10, '0')
            || 'v' || lpad(printf('%x', ((doc_id // 2) * {_H2_MUL} + 13) % {_MASK + 1}), 10, '0')
             AS base,
           CAST((doc_id // 2) % 20 + 2 AS INT) AS p
    FROM documents
  )
)"""

EDIT_DISTANCE_JOIN_SQL = f"""
WITH {_NAMES_SQL}
-- brute-force oracle: ALL pairs within the length filter, exact
-- levenshtein (certifies the Spark side's segment-pigeonhole pipeline
-- found every qualifying pair and nothing else)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM names a
JOIN names b
  ON a.doc_id < b.doc_id
 AND abs(length(a.name) - length(b.name)) <= {D}
WHERE levenshtein(a.name, b.name) <= {D}
ORDER BY doc_a, doc_b
"""
