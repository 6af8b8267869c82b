"""Privacy-preserving record linkage (PPRL) via Bloom-filter CLK
encodings — Schnell, Bachteler & Reiher (2009), the field's standard.

When two parties must link records WITHOUT revealing identifiers,
each encodes its identifier's character bigrams into a fixed-length
Bloom filter (the Cryptographic Long-term Key) and only the bitmaps
are compared: similar strings share most bigrams, so their bitmaps
share most set bits, and the Dice coefficient of the bitmaps
approximates the Dice coefficient of the bigram sets. The linkage
then never touches a raw value — exactly the constraint a cross-
organization 100 TB match (health records ↔ crawl-profile dedup)
operates under.

Relational construction, pure Catalyst bit arithmetic:

1. ENCODE — distinct char bigrams per name; each gram hashed to
   ``K = 2`` positions in a ``BF = 256``-bit filter by double hashing
   (pos_j = (h1 + j·h2) mod BF over the portable 60-bit md5 bigint,
   the ``dedup``/minhash key discipline); the filter is packed as
   8 words × 32 bits (word values < 2^31·2 stay positive and shifts
   stay ≤ 31 — BOTH engines reject a shift into bigint bit 63), one
   ``bit_or`` aggregation per word.
2. BLOCK — each nonzero WORD doubles as a 32-bit pigeonhole segment:
   candidates = pairs agreeing on ≥1 (word_idx, word_value). A pair
   of names differing by e edits differs in ≤ 3e bigrams → ≤ 6e
   filter positions; 6e < 8 segments (e = 1 here) leaves ≥ 2 words
   bit-identical, so the planted dirty pairs are found with the same
   pigeonhole logic as the SimHash byte-band join — declared
   caveats: a pair whose untouched words are all EMPTY is missed
   (empty words cannot band — they would posting-list every record),
   and hot (word_idx, value) postings are DF-CAPPED out of the
   banding (``MAX_DF``, the inverted-index discipline every candidate
   generator here follows; see the constant's comment for the 1M-doc
   blowup that mandated it).
3. VERIFY — integer Dice over the bitmaps:
   ``dice_ppm = 2·Σ bit_count(a_k & b_k) · 10^6 div (pop_a + pop_b)``
   — no float anywhere, so the brute-force DuckDB oracle (ALL pairs
   sharing a nonzero word, exact Dice) matches hash-exactly.

Input: the ``editjoin`` planted dirty-key names (groups 2m/2m+1, one
char deleted) — the SAME corpus the exact edit-distance join links,
so the two relations read together: what the cleartext join finds
exactly, the encoded join must find through the Bloom filters. The
driver query emits every candidate pair with ``dice_ppm ≥ 800000``.

Scale shape (100 TB): encode is one distinct + one 8-expression
groupBy (map-side combinable); banding explodes ≤ 8 rows per record;
the candidate equi-join is inverted-index-shaped on a 4-byte key
space of ~2^32 (posting lists ~N/2^32 absent planted structure);
verify touches candidates only. Nothing quadratic, nothing Python.

Reference analog: none — PPRL is the grafted ER tier (the reference
links cleartext mentions; CLK linkage is what the same pipeline runs
when the identifiers are legally unsharable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .editjoin import _NAMES_SQL, _names

BF_BITS = 256
N_WORDS = 8  # 8 × 32-bit words; word == pigeonhole segment
K_HASH = 2
DICE_MIN_PPM = 800_000
_PPM = 1_000_000
# df cap on (word_idx, word_value) postings — the SAME hot-key hatch as
# every inverted index here. The bigram space of structured identifiers
# is small (hex names: ~324 grams), so a window whose set positions come
# only from COMMON grams repeats across a large doc fraction; without
# the cap the 1M-doc banding join degenerated quadratically (a 2-core
# leg still running at 23 min). A planted pair survives the cap through
# any shared word that includes a group-SPECIFIC gram's bits — rare by
# construction — so only pairs whose EVERY shared word is corpus-hot
# are lost. Measured at 1M docs (32 cores, `BENCH.md`): cap 50 →
# planted recall 98.19%; cap 200 → 99.77% at the same runtime, so 200
# is the default; the worst posting still caps the join fan-out at
# 200²/2 = 20k pairs.
MAX_DF = 200


def clk_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_a, doc_b, inter_bits, pop_a, pop_b, dice_ppm)
    for every banded pair with Dice ≥ 0.8 — the encoded-only linkage
    over the planted dirty-key corpus."""
    return clk_linkage_over(_names(spark, sf_dir))


def _bloom_words(names: DataFrame) -> DataFrame:
    """(doc_id, w0..w7, pop): the packed 256-bit CLK per name."""
    grams = (
        names.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("name") - 1)
            ).alias("i"),
            "name",
        )
        .select("doc_id", F.col("name").substr(F.col("i"), F.lit(2)).alias("gram"))
        .distinct()
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10).cast("bigint")
    pos = (
        grams.select(
            "doc_id",
            (h % BF_BITS).alias("h1"),
            # h div 256 as a shift — float '/' would lose bits past 2^53
            (F.lit(1) + F.shiftright(h, 8) % (BF_BITS - 1)).alias("h2"),
        )
        .select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        (F.col("h1") + j * F.col("h2")) % BF_BITS
                        for j in range(K_HASH)
                    ]
                )
            ).alias("pos"),
        )
        .distinct()
    )
    words = pos.groupBy("doc_id").agg(
        *[
            F.expr(
                f"bit_or(CASE WHEN pos div 32 = {k} "
                f"THEN shiftleft(cast(1 as bigint), cast(pos % 32 as int)) "
                f"ELSE cast(0 as bigint) END)"
            ).alias(f"w{k}")
            for k in range(N_WORDS)
        ]
    )
    return words.select(
        "doc_id",
        *[f"w{k}" for k in range(N_WORDS)],
        sum(
            F.bit_count(F.col(f"w{k}")) for k in range(N_WORDS)
        ).alias("pop"),
    )


def clk_linkage_over(
    names: DataFrame, dice_min_ppm: int = DICE_MIN_PPM
) -> DataFrame:
    """Generic core over ANY (doc_id, name) relation: CLK encode →
    nonzero-word banding → integer-Dice verify."""
    # encoded CLK relation referenced 3x (band explode + both verify
    # probes), bands 3x (df agg + self-join sides): lazy localCheckpoints
    # materialize the encode once per query instead of once per reference
    words = _bloom_words(names).localCheckpoint(eager=False)
    bands = words.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"w{k}") for k in range(N_WORDS)])
        ).alias("seg", "val"),
    ).filter(F.col("val") != 0)
    ok = (
        bands.groupBy("seg", "val")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAX_DF)
        .select("seg", "val")
    )
    bands = bands.join(ok, ["seg", "val"]).localCheckpoint(eager=False)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["seg", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    wa = words.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pop").alias("pop_a"),
        *[F.col(f"w{k}").alias(f"a{k}") for k in range(N_WORDS)],
    )
    wb = words.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pop").alias("pop_b"),
        *[F.col(f"w{k}").alias(f"b{k}") for k in range(N_WORDS)],
    )
    inter = sum(
        F.bit_count(F.col(f"a{k}").bitwiseAND(F.col(f"b{k}")))
        for k in range(N_WORDS)
    )
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.cast("int").alias("inter_bits"),
            F.col("pop_a").cast("int").alias("pop_a"),
            F.col("pop_b").cast("int").alias("pop_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_bits",
            "pop_a",
            "pop_b",
            F.expr(
                f"2 * cast(inter_bits as bigint) * {_PPM}"
                " div (pop_a + pop_b)"
            ).alias("dice_ppm"),
        )
        .filter(
            F.expr(
                f"2 * cast(inter_bits as bigint) * {_PPM}"
                f" >= {dice_min_ppm} * cast(pop_a + pop_b as bigint)"
            )
        )
        .orderBy("doc_a", "doc_b")
    )


CLK_LINKAGE_SQL = f"""
WITH {_NAMES_SQL},
grams AS (
  SELECT DISTINCT doc_id, substr(name, i, 2) AS gram
  FROM (
    SELECT doc_id, name,
           unnest(generate_series(1, length(name) - 1)) AS i
    FROM names
  )
),
hh AS (
  SELECT doc_id,
         h % {BF_BITS} AS h1,
         1 + (h // {BF_BITS}) % {BF_BITS - 1} AS h2
  FROM (
    SELECT doc_id,
           ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
    FROM grams
  )
),
pos AS (
  SELECT DISTINCT doc_id, (h1 + j * h2) % {BF_BITS} AS pos
  FROM hh, range({K_HASH}) r(j)
),
words AS (
  SELECT doc_id,
         {", ".join(
             f"bit_or(CASE WHEN pos // 32 = {k} "
             f"THEN (1::BIGINT << CAST(pos % 32 AS INT)) "
             f"ELSE 0::BIGINT END) AS w{k}"
             for k in range(N_WORDS)
         )}
  FROM pos GROUP BY doc_id
),
wp AS (
  SELECT *,
         {" + ".join(f"bit_count(w{k})" for k in range(N_WORDS))} AS pop
  FROM words
),
-- the banding predicate mirrored verbatim: pairs sharing >= 1 NONZERO
-- word whose (word_idx, value) posting is under the df cap
bands AS (
  SELECT doc_id, seg, val FROM (
    SELECT doc_id,
           unnest([{", ".join(str(k) for k in range(N_WORDS))}]) AS seg,
           unnest([{", ".join(f"w{k}" for k in range(N_WORDS))}]) AS val
    FROM wp
  ) WHERE val <> 0
),
ok AS (
  SELECT seg, val FROM bands GROUP BY seg, val HAVING count(*) <= {MAX_DF}
),
b2 AS (SELECT bands.* FROM bands JOIN ok USING (seg, val)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM b2 a JOIN b2 b USING (seg, val)
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST({" + ".join(f"bit_count(a.w{k} & b.w{k})" for k in range(N_WORDS))}
            AS INT) AS inter_bits,
       CAST(a.pop AS INT) AS pop_a,
       CAST(b.pop AS INT) AS pop_b,
       CAST(2 * ({" + ".join(f"bit_count(a.w{k} & b.w{k})" for k in range(N_WORDS))})
            * {_PPM} // (a.pop + b.pop) AS BIGINT) AS dice_ppm
FROM cand
JOIN wp a ON a.doc_id = doc_a
JOIN wp b ON b.doc_id = doc_b
WHERE 2 * ({" + ".join(f"bit_count(a.w{k} & b.w{k})" for k in range(N_WORDS))})
      * {_PPM} >= {DICE_MIN_PPM} * (a.pop + b.pop)
ORDER BY doc_a, doc_b
"""
