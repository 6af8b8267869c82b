"""Mergeable sketch relations: HyperLogLog (cardinality), Count-Min
(frequency) and Bloom (membership) state tables as relational algebra.

Counting distinct anything (urls, tokens, users) exactly at 10^12 rows
costs a full shuffle of the distinct keys; every serious pipeline
carries a MERGEABLE sketch instead: per-partition register tables that
combine by element-wise max — associative, commutative, idempotent —
so cardinality estimation becomes one tiny aggregation, resumable and
cross-shard combinable for free. Spark ships HLL++ inside
``approx_count_distinct``, but its registers are opaque and its
estimate unhashable across engines; this operator builds the register
TABLE itself as a first-class relation, so the sketch state can be
stored, merged across days/shards, and — because every step is integer
arithmetic on an md5-derived hash — certified bit-exact against the
DuckDB oracle (the estimate never crosses engines, only registers do).

Construction (classic Flajolet HLL, p = 8 → m = 256 registers):
``h`` = first 60 bits of md5(token) (15 hex chars — both engines parse
identically, probed: conv(...,16,10) == ('0x'||...)::BIGINT);
``bucket = h mod 256``; ``rho`` = leading-zero count of the remaining
52 bits + 1, computed by a generated 52-arm integer CASE ladder (NO
log2/floats — libm is not portable across engines). The aggregation
is ``groupBy(source, bucket).max(rho)`` — ONE map-side-combining
shuffle whose key space is at most sources × 256 regardless of input
size: the 100 TB shape by construction. Duplicate tokens need no
pre-dedup — max() absorbs them; that insensitivity IS the sketch.

Per-SOURCE register tables (not one global sketch) exercise the real
deployment pattern: each shard/day/source keeps its own registers and
any subset union-merges by max. ``merge_registers`` +
``hll_estimate`` (below) are the read path; mergeability (per-source
max-merge == whole-corpus sketch) and estimate accuracy are pinned by
pytest, while the driver oracle hashes the register construction.

Reference analog: the reference counts distinct mentions/CUIs eagerly
(pandas ``nunique`` over collected frames, e.g.
``bioel/bioel/utils/bigbio_utils.py`` dataset summaries); at crawl
scale that exact pass is the thing this sketch replaces.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_SUFFIX_BITS = 60 - HLL_P  # 52

# integer bit-length CASE ladder (portable: same SQL text runs in Spark
# and DuckDB; no floats, no libm)
_BITLEN_CASE = (
    "CASE "
    + " ".join(
        f"WHEN suffix >= {1 << k} THEN {k + 1}"
        for k in range(_SUFFIX_BITS - 1, -1, -1)
    )
    + " ELSE 0 END"
)


def vocab_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → per-source HLL registers over the token vocabulary.

    Output: (source, bucket, max_rho) — the sketch state itself.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    hashed = toks.select(
        "source",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    staged = hashed.select(
        "source",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("suffix"),
    ).select(
        "source",
        "bucket",
        (F.lit(_SUFFIX_BITS + 1) - F.expr(_BITLEN_CASE)).alias("rho"),
    )
    return (
        staged.groupBy("source", "bucket")
        .agg(F.max("rho").alias("max_rho"))
        .orderBy("source", "bucket")
    )


VOCAB_HLL_REGISTERS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
hashed AS (
  SELECT source,
         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM toks
),
staged AS (
  SELECT source, h % {HLL_M} AS bucket, h // {HLL_M} AS suffix FROM hashed
),
rhos AS (
  SELECT source, bucket, {_SUFFIX_BITS + 1} - ({_BITLEN_CASE}) AS rho
  FROM staged
)
SELECT source, bucket, max(rho) AS max_rho
FROM rhos
GROUP BY source, bucket
ORDER BY source, bucket
"""


# ---------------------------------------------------------------------------
# read path (driver-side, O(m) — registers, not data)
# ---------------------------------------------------------------------------


def merge_registers(*registers: dict[int, int]) -> dict[int, int]:
    """Union-merge sketches: element-wise max. Associative/commutative/
    idempotent — merging any partitioning of the input equals sketching
    the whole (pinned by pytest)."""
    out: dict[int, int] = {}
    for reg in registers:
        for b, r in reg.items():
            if r > out.get(b, 0):
                out[b] = r
    return out


def hll_estimate(registers: dict[int, int], m: int = HLL_M) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; absent buckets are empty registers."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    est = alpha * m * m / s
    zeros = sum(1 for b in range(m) if registers.get(b, 0) == 0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Count-Min Sketch: the mergeable FREQUENCY sketch beside HLL's cardinality
# ---------------------------------------------------------------------------
#
# "How often does token/url/entity X occur?" at 10^12 rows has the same
# problem exact distinct-counting has: the key space (33.5M distinct
# tokens at just 1M docs) is the thing that doesn't fit. CMS bounds the
# state instead: d independent hash rows x w counters; every occurrence
# increments one cell per row; a point estimate reads min over the d
# cells — an OVERestimate with error <= 2N/w at confidence 1-2^-d
# (Cormode & Muthukrishnan 2005). Cell-wise SUM merges shards/days —
# the same associativity that makes HLL's max-merge shippable.
#
# Relationally the construction is: explode tokens -> 4 salted
# md5-buckets per token (posexplode of a staged 4-array) -> ONE
# map-side-combining groupBy(source, row, bucket).count() whose key
# space is <= sources x d x w REGARDLESS of corpus size. All integer
# arithmetic on md5 -> certified bit-exact against DuckDB.

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row


def token_cms_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → per-source Count-Min register table.

    Output: (source, row, bucket, cnt) — the sketch state itself, one
    relation row per NON-ZERO cell (zero cells are implicit, exactly as
    absent HLL registers are empty).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cells = toks.select(
        "source",
        F.posexplode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{j}:"), F.col("token"))),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % CMS_W
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        cells.groupBy("source", "row", "bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("source", "row", "bucket")
    )


_CMS_ROW_SELECTS = "\nUNION ALL\n".join(
    f"SELECT source, {j} AS row, "
    f"('0x' || substr(md5('{j}:' || token), 1, 15))::BIGINT % {CMS_W} "
    f"AS bucket FROM toks"
    for j in range(CMS_D)
)

TOKEN_CMS_REGISTERS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
cells AS (
{_CMS_ROW_SELECTS}
)
SELECT source, row, bucket, count(*) AS cnt
FROM cells
GROUP BY source, row, bucket
ORDER BY source, row, bucket
"""


# ---------------------------------------------------------------------------
# CMS read path (driver-side, O(d*w) state — registers, not data)
# ---------------------------------------------------------------------------


def _cms_buckets(token: str) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:15], 16) % CMS_W
        for j in range(CMS_D)
    ]


def cms_merge(*sketches: dict[tuple[int, int], int]) -> dict[tuple[int, int], int]:
    """Union-merge CMS states: cell-wise SUM. Associative + commutative,
    so any partitioning of the input merges to the whole-corpus sketch
    (pinned by pytest). Keys are (row, bucket)."""
    out: dict[tuple[int, int], int] = {}
    for sk in sketches:
        for cell, c in sk.items():
            out[cell] = out.get(cell, 0) + c
    return out


def cms_estimate(sketch: dict[tuple[int, int], int], token: str) -> int:
    """Point frequency estimate: min over the d cells the token maps to.
    Never underestimates; overestimate bounded by 2N/w w.p. 1-2^-d."""
    return min(
        sketch.get((j, b), 0) for j, b in enumerate(_cms_buckets(token))
    )


# ---------------------------------------------------------------------------
# Bloom filter: the mergeable MEMBERSHIP sketch completing the family
# ---------------------------------------------------------------------------
#
# HLL answers "how many distinct", CMS answers "how often", Bloom
# answers "have we seen X" — the three queries a 10^12-row pipeline
# keeps asking where the exact key set is the thing that doesn't fit.
# The canonical deployment here is decontamination at fleet scale:
# TODAY ``contamination_hits`` broadcasts the exact benchmark gram set
# (right at benchmark sizes); when the blocklist itself is huge (every
# gram of every eval suite, multi-GB), the broadcast side becomes a
# Bloom BIT TABLE — m bits regardless of member count, set-union
# mergeable (bit OR == relational DISTINCT union of set positions), no
# false negatives ever, false positives ~ (1-e^{-kn/m})^k retested
# exactly downstream.
#
# The relation is the SET-BIT table (source, bit): k salted-md5 probes
# per member -> posexplode -> DISTINCT. Key space <= sources x m by
# construction; every step integer md5 arithmetic -> certified
# bit-exact against DuckDB.

BLOOM_M = 4096  # bits
BLOOM_K = 3  # probes per member


def benchmark_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → set-bit table of a Bloom filter over the BENCHMARK
    split's token vocabulary, per source (the decontamination
    blocklist-sketch deployment: doc_id % 10 == 0 plays the eval suite,
    matching ``dedup.decontamination``'s split).

    Output: (source, bit) — the sketch state, one row per SET bit.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    toks = bench.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    bits = toks.select(
        "source",
        F.explode(
            F.array(
                *[
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"b{j}:"), F.col("token"))),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % BLOOM_M
                    )
                    for j in range(BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    return bits.distinct().orderBy("source", "bit")


_BLOOM_PROBE_SELECTS = "\nUNION ALL\n".join(
    f"SELECT source, "
    f"('0x' || substr(md5('b{j}:' || token), 1, 15))::BIGINT % {BLOOM_M} "
    f"AS bit FROM toks"
    for j in range(BLOOM_K)
)

BENCHMARK_BLOOM_BITS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id % 10 = 0
),
bits AS (
{_BLOOM_PROBE_SELECTS}
)
SELECT DISTINCT source, bit
FROM bits
ORDER BY source, bit
"""


# ---------------------------------------------------------------------------
# Bloom read path (driver-side, O(m) state)
# ---------------------------------------------------------------------------


def _bloom_bits(token: str) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"b{j}:{token}".encode()).hexdigest()[:15], 16)
        % BLOOM_M
        for j in range(BLOOM_K)
    ]


def bloom_merge(*filters: set[int]) -> set[int]:
    """Union-merge Bloom states: bit OR (= set union). Associative,
    commutative, idempotent — any shard partitioning merges to the
    whole-corpus filter (pinned by pytest)."""
    out: set[int] = set()
    for f in filters:
        out |= f
    return out


def bloom_contains(bits: set[int], token: str) -> bool:
    """Membership probe: True iff every probe bit is set. No false
    negatives (structural); false-positive rate ~ (1-e^{-kn/m})^k."""
    return all(b in bits for b in _bloom_bits(token))


# ---------------------------------------------------------------------------
# Log-binned histogram: the mergeable QUANTILE sketch closing the family
# ---------------------------------------------------------------------------
#
# ``text_analysis.length_quantiles`` computes EXACT per-source order
# statistics — irreducibly a per-group global pass. The 10^12-row
# default is a mergeable summary; t-digest is the usual choice but its
# centroids are float state (unhashable across engines, merge-order
# dependent). A LOG-BINNED HISTOGRAM has the same read API (quantiles
# within a guaranteed relative error) with INTEGER state: bin =
# floor(log_{1+eps}(x)) computed by an integer CASE ladder over
# precomputed bin edges (no libm), counts merge by SUM, and any
# quantile reads off the cumulative distribution with relative error
# <= eps by construction. Bin count for eps=0.1, values 1..10^9:
# log(10^9)/log(1.1) ~ 218 — bounded state at any input size.

HIST_EPS_NUM = 11  # bin growth factor 11/10 = 1 + eps, eps = 0.1
HIST_EPS_DEN = 10
HIST_MAX_VALUE = 10**9


def _hist_edges() -> list[int]:
    """Integer bin edges 1 = e_0 < e_1 < ... growing by ~(1+eps):
    e_{i+1} = max(e_i + 1, e_i * 11 div 10) — exact integer arithmetic,
    identical in any engine (precomputed here, inlined as literals)."""
    edges = [1]
    while edges[-1] < HIST_MAX_VALUE:
        e = edges[-1]
        edges.append(max(e + 1, (e * HIST_EPS_NUM) // HIST_EPS_DEN))
    return edges


HIST_EDGES = _hist_edges()

# integer CASE ladder: value -> bin index (descending tests, no libm)
_HIST_BIN_CASE = (
    "CASE "
    + " ".join(
        f"WHEN v >= {e} THEN {i}"
        for i, e in reversed(list(enumerate(HIST_EDGES)))
    )
    + " ELSE -1 END"
)


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → per-source log-binned histogram of n_chars.

    Output: (source, bin, cnt) — the sketch state; bin -1 collects
    values < 1 (empty docs). One map-side-combining shuffle whose key
    space is ≤ sources × ~220 bins at any corpus size.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    binned = docs.select(
        "source", F.col("n_chars").alias("v")
    ).select("source", F.expr(_HIST_BIN_CASE).alias("bin"))
    return (
        binned.groupBy("source", "bin")
        .agg(F.count("*").alias("cnt"))
        .orderBy("source", "bin")
    )


LENGTH_HISTOGRAM_SQL = f"""
WITH binned AS (
  SELECT source, {_HIST_BIN_CASE} AS bin
  FROM (SELECT source, n_chars AS v FROM documents)
)
SELECT source, bin, count(*) AS cnt
FROM binned
GROUP BY source, bin
ORDER BY source, bin
"""


# ---------------------------------------------------------------------------
# histogram read path (driver-side, O(bins) state)
# ---------------------------------------------------------------------------


def hist_merge(*hists: dict[int, int]) -> dict[int, int]:
    """Union-merge histogram states: bin-wise SUM (associative +
    commutative — any shard partitioning merges to the whole)."""
    out: dict[int, int] = {}
    for h in hists:
        for b, c in h.items():
            out[b] = out.get(b, 0) + c
    return out


def hist_quantile(hist: dict[int, int], q_num: int, q_den: int) -> int:
    """Discrete quantile estimate: the LOWER EDGE of the bin where the
    cumulative count first reaches ceil(q·n) — matching
    ``length_quantiles``'s discrete-percentile definition at bin
    resolution, so the estimate is within one bin (relative error
    ≤ eps = 0.1) of the exact order statistic (pinned by pytest
    against the exact operator)."""
    n = sum(hist.values())
    if n == 0:
        raise ValueError("empty histogram")
    target = (q_num * n + q_den - 1) // q_den
    cum = 0
    for b in sorted(hist):
        cum += hist[b]
        if cum >= target:
            return HIST_EDGES[b] if b >= 0 else 0
    return HIST_EDGES[max(hist)]
