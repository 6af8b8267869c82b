"""Group (household) linkage — two-level entity resolution: link
GROUPS of records by the overlap of their matched members (On,
Koudas, Srivastava & Yu, ICDE 2007, "Group Linkage"), then enforce
1:1 group matching with the mutual-best handshake.

Record-level linkage answers "is a = b"; a census/CRM/web-account
deployment just as often needs "is household A the same household as
B" where NO single member match is decisive — members move out, names
change, a roommate appears in two households' rosters. The group
linkage measure scores a group pair by its matched members:

    dice(G_a, G_b) = 2·|matched(G_a, G_b)| / (|G_a| + |G_b|)

(On et al.'s bipartite-match similarity reduces to exactly this when
member matching is an equality predicate and member keys are unique
within a group — the paper's own starting configuration); pairs above
a LOW threshold form the group candidate graph and the 1:1 constraint
is the same locally-dominant handshake as ``fs_mutual_match``
(``mutual_best_over`` is reused verbatim — the operator composes).

Relational construction: member equi-join on key → count per group
pair (= |intersection|, keys unique per group-side) → group sizes
joined back → integer cross-multiplied Dice filter → handshake. One
member-keyed shuffle + one bounded group-pair aggregation; nothing
quadratic in groups, nothing touches raw member attributes after the
join key. Hot member keys (a key shared by thousands of groups) take
the same df-cap/salting hatches as every inverted index here.

Input: synthesized households from doc_id (household h = doc_id div 2;
even doc = file-A roster, odd = file-B roster), mirrored in the
oracle. Sizes 3 + h%3 ∈ {3,4,5}. Corruption class c = h%4 on the B
side: 0 → identical roster; 1 → one member left (drop slot 0);
2 → one left + one new alien member; 3 → dissolved (one shared member
remains, rest alien). Cross-household noise: households 7k+1 (file A)
and 7k+2 (file B) share ONE "moved roommate" key — a genuine weak
cross edge that must lose the handshake to the households' own
partners. The hash certifies member-join, counting, Dice and
handshake; the pure-Python test re-derives the whole pipeline.

Reference analog: none — the reference links single mentions; group
linkage is the grafted ER tier (the two-level shape every
household/org-unit deployment needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fellegi_sunter import mutual_best_over

DICE_MIN_PPM = 200_000
_PPM = 1_000_000
_MEMBER_BASE = 4_000_000_000_000  # normal member keys: base + h*8 + j
_ALIEN_BASE = 5_000_000_000_000   # alien members: base + doc_id*8 + j
_ROOM_BASE = 6_000_000_000_000    # moved-roommate keys: base + k
_GB_OFFSET = 1 << 40              # disjoint group-id spaces for the handshake


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (gid, member): both files' rosters, gid globally
    unique (file B offset by 2^40)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    h = F.expr("doc_id div 2")
    is_a = F.col("doc_id") % 2 == 0
    c = h % 4
    size = (h % 3) + 3
    base = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), size - 1)).alias("j"),
    ).select(
        "doc_id",
        "j",
        F.expr("doc_id div 2").alias("h"),
    )
    cc = F.col("h") % 4
    member = F.when(
        (F.col("doc_id") % 2 == 1) & (cc == 2) & (F.col("j") == 0),
        # class 2, B side: slot 0 replaced by an alien
        F.lit(_ALIEN_BASE) + F.col("doc_id") * 8 + F.col("j"),
    ).when(
        (F.col("doc_id") % 2 == 1) & (cc == 3) & (F.col("j") > 0),
        # class 3, B side: dissolved — only slot 0 is still shared
        F.lit(_ALIEN_BASE) + F.col("doc_id") * 8 + F.col("j"),
    ).otherwise(F.lit(_MEMBER_BASE) + F.col("h") * 8 + F.col("j"))
    rows = base.select(
        F.when(
            F.col("doc_id") % 2 == 0, F.col("h")
        ).otherwise(F.lit(_GB_OFFSET) + F.col("h")).alias("gid"),
        member.alias("member"),
    ).filter(
        # class 1, B side: slot 0 left the household
        ~(
            (F.col("gid") >= _GB_OFFSET)
            & ((F.col("gid") - _GB_OFFSET) % 4 == 1)
            & (F.col("member") == F.lit(_MEMBER_BASE)
               + (F.col("gid") - _GB_OFFSET) * 8)
        )
    )
    # the moved roommate: one extra key in A-roster of 7k+1 and
    # B-roster of 7k+2
    room_a = docs.filter(
        (F.col("doc_id") % 2 == 0) & (F.expr("doc_id div 2") % 7 == 1)
    ).select(
        F.expr("doc_id div 2").alias("gid"),
        (F.lit(_ROOM_BASE) + F.expr("(doc_id div 2) div 7")).alias("member"),
    )
    room_b = docs.filter(
        (F.col("doc_id") % 2 == 1) & (F.expr("doc_id div 2") % 7 == 2)
    ).select(
        (F.lit(_GB_OFFSET) + F.expr("doc_id div 2")).alias("gid"),
        (
            F.lit(_ROOM_BASE) + F.expr("((doc_id div 2) - 1) div 7")
        ).alias("member"),
    )
    return rows.unionByName(room_a).unionByName(room_b)


def group_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (group_a, group_b, matched, sz_a, sz_b, dice_ppm):
    the 1:1 household matching."""
    return group_linkage_over(_members(spark, sf_dir))


def group_linkage_over(
    members: DataFrame, dice_min_ppm: int = DICE_MIN_PPM
) -> DataFrame:
    """Generic core over ANY (gid, member) roster relation with file A
    gids < 2^40 ≤ file B gids: Dice group scores + mutual-best 1:1."""
    # roster referenced 3x (size agg + both join sides), scores 2x
    # (handshake input + final re-attach): lazy localCheckpoints stop
    # Catalyst re-deriving the generator subtree per reference (118
    # parquet scans in the r5 sf0.1 plan → 2 after)
    members = members.localCheckpoint(eager=False)
    sz = members.groupBy("gid").agg(F.count("*").alias("sz"))
    a = members.filter(F.col("gid") < _GB_OFFSET).select(
        F.col("gid").alias("ga"), "member"
    )
    b = members.filter(F.col("gid") >= _GB_OFFSET).select(
        F.col("gid").alias("gb"), "member"
    )
    matched = (
        a.join(b, "member")
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("matched"))
    )
    scored = (
        matched.join(sz.select(F.col("gid").alias("ga"),
                               F.col("sz").alias("sz_a")), "ga")
        .join(sz.select(F.col("gid").alias("gb"),
                        F.col("sz").alias("sz_b")), "gb")
        .withColumn(
            "dice_ppm",
            F.expr(f"2 * matched * {_PPM} div (sz_a + sz_b)"),
        )
        .filter(
            F.expr(f"2 * matched * {_PPM} >= {dice_min_ppm} * (sz_a + sz_b)")
        )
        .localCheckpoint(eager=False)
    )
    pairs = mutual_best_over(
        scored.select(
            F.col("ga").alias("id_a"), F.col("gb").alias("id_b"), "dice_ppm"
        ),
        "dice_ppm",
    )
    return (
        pairs.join(
            scored.select(
                F.col("ga").alias("id_a"),
                F.col("gb").alias("id_b"),
                "matched",
                "sz_a",
                "sz_b",
            ),
            ["id_a", "id_b"],
        )
        .select(
            F.col("id_a").alias("group_a"),
            (F.col("id_b") - _GB_OFFSET).alias("group_b"),
            F.col("matched").cast("int").alias("matched"),
            F.col("sz_a").cast("int").alias("sz_a"),
            F.col("sz_b").cast("int").alias("sz_b"),
            "dice_ppm",
        )
        .orderBy("group_a")
    )


GROUP_LINKAGE_SQL = f"""
WITH d AS (SELECT doc_id, doc_id // 2 AS h FROM documents),
base AS (
  SELECT doc_id, h, j,
         CASE
           WHEN doc_id % 2 = 1 AND h % 4 = 2 AND j = 0
             THEN {_ALIEN_BASE} + doc_id * 8 + j
           WHEN doc_id % 2 = 1 AND h % 4 = 3 AND j > 0
             THEN {_ALIEN_BASE} + doc_id * 8 + j
           ELSE {_MEMBER_BASE} + h * 8 + j
         END AS member
  FROM (SELECT doc_id, h, unnest(generate_series(0, h % 3 + 2)) AS j
        FROM d)
),
rows_ AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN h ELSE {_GB_OFFSET} + h END AS gid,
         member
  FROM base
  WHERE NOT (doc_id % 2 = 1 AND h % 4 = 1
             AND member = {_MEMBER_BASE} + h * 8)
  UNION ALL
  SELECT h AS gid, {_ROOM_BASE} + h // 7 AS member
  FROM d WHERE doc_id % 2 = 0 AND h % 7 = 1
  UNION ALL
  SELECT {_GB_OFFSET} + h AS gid, {_ROOM_BASE} + (h - 1) // 7 AS member
  FROM d WHERE doc_id % 2 = 1 AND h % 7 = 2
),
sz AS (SELECT gid, CAST(count(*) AS BIGINT) AS sz FROM rows_ GROUP BY gid),
matched AS (
  SELECT a.gid AS ga, b.gid AS gb, CAST(count(*) AS BIGINT) AS matched
  FROM rows_ a JOIN rows_ b ON a.member = b.member
  WHERE a.gid < {_GB_OFFSET} AND b.gid >= {_GB_OFFSET}
  GROUP BY a.gid, b.gid
),
scored AS (
  SELECT m.ga, m.gb, m.matched, sa.sz AS sz_a, sb.sz AS sz_b,
         2 * m.matched * {_PPM} // (sa.sz + sb.sz) AS dice_ppm
  FROM matched m
  JOIN sz sa ON sa.gid = m.ga
  JOIN sz sb ON sb.gid = m.gb
  WHERE 2 * m.matched * {_PPM} >= {DICE_MIN_PPM} * (sa.sz + sb.sz)
),
sym AS (
  SELECT ga AS u, gb AS v, dice_ppm FROM scored
  UNION ALL
  SELECT gb AS u, ga AS v, dice_ppm FROM scored
),
best AS (
  SELECT u, v FROM (
    SELECT u, v,
           row_number() OVER (PARTITION BY u
                              ORDER BY dice_ppm DESC, v ASC) AS rn
    FROM sym
  ) WHERE rn = 1
)
SELECT s.ga AS group_a, s.gb - {_GB_OFFSET} AS group_b,
       CAST(s.matched AS INT) AS matched,
       CAST(s.sz_a AS INT) AS sz_a,
       CAST(s.sz_b AS INT) AS sz_b,
       s.dice_ppm
FROM scored s
JOIN best x ON x.u = s.ga AND x.v = s.gb
JOIN best y ON y.u = s.gb AND y.v = s.ga
ORDER BY group_a
"""
