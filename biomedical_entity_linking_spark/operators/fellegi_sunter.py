"""Fellegi–Sunter probabilistic record linkage with UNSUPERVISED
EM-estimated match weights — the classical ER model (Fellegi & Sunter
1969; the public Splink engine is the modern deployment of exactly this
construction) expressed Spark-first.

The reference scores candidate pairs with trained neural kernels
(``bioel/bioel/models/`` biencoder/crossencoder); the Fellegi–Sunter
model is the statistics-first sibling every production linkage stack
still runs where labels don't exist: compare each candidate pair on K
discrete fields (the comparison vector γ), assume field agreements are
independent given the latent match/non-match class, and estimate — with
NO labels, by EM over the γ-pattern counts — the match prevalence λ and
the per-field agreement probabilities m_k = P(agree | match), u_k =
P(agree | non-match). The posterior P(match | γ) then scores every pair
via Bayes.

Scale shape (the whole point at 10^12 rows): the DATA-scale work is one
blocked self-join producing comparison vectors and ONE map-side-
combinable count aggregation onto at most 2^K rows (K = 3 here → ≤ 8
groups; hot blocking keys combine per-partition before the shuffle
exactly like the A6 count family). EM itself runs over those ≤ 2^K
aggregated counts — state O(2^K), INDEPENDENT of corpus size — so
collecting the pattern table to the driver is bounded by the comparison
-space cardinality, not the data (same sanctioned move as chi²'s tiny
crosstab, ``metrics.py``). Per-pair posteriors come back as a ≤ 2^K-row
broadcast joined onto the pair relation: no second scoring pass, no
per-pair Python anywhere.

Cross-engine exactness: EM is float math in every textbook; floats are
unhashable across engines (sum-order, libm). Here every probability is
an INTEGER in micro-units (``SCALE = 10^9``) and every E/M step is
integer multiply-shift arithmetic — ``pm = pm·m_k div SCALE`` chained in
a FIXED field order, responsibilities ``resp = pm·SCALE div (pm+pu)``,
M-step ratios by integer division, parameters clamped to [1, SCALE−1]
(the clamp also removes the degenerate-fixpoint divide-by-zero). Sums
in the M-step are sums of integer products — exact and order-
independent — so after any number of iterations both engines hold
bit-identical parameters. The deliberate cost is ≤ 1 micro-unit of
truncation per multiply, identical on both sides (same fixed-point
trade as ``linkgraph.pagerank``'s RANK_SCALE mass). The Spark side runs
the recurrence in arbitrary-precision Python ints over the collected
pattern rows; the oracle unrolls the SAME recurrence as DuckDB CTEs in
HUGEINT (int128) — intermediate M-step products reach counts·SCALE²
which is why the oracle widens; final outputs are cast back to BIGINT.

Comparison fields over the ``documents`` table (doc_id, text, lang,
source): γ_text = 48-char-normalized-text equality (the planted
exact-dup groups make this the match signal), γ_lang = language
equality, γ_source = source equality. Candidate pairs block on the
24-char normalized prefix — the skew-measured key from
``incremental.py`` (BLOCK_LEN 12 put 3.2M of 3.8M pairs under the one
viral-title block at 1M docs; 24 reaches into the first body word).

Outputs:
* ``fs_em_weights`` — the estimated MODEL: one row per observed
  γ-pattern with its pair count and posterior match responsibility,
  plus the converged global parameters (λ, m_k, u_k) in micro-units.
* ``fs_pair_posteriors`` — the LINKER: every candidate pair whose
  posterior P(match|γ) ≥ 1/2, i.e. the edge list a downstream
  connected-components pass would cluster (``connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NORM_LEN = 96  # comparison field: 96-char normalized text — wider than
# the 24-char BLOCK key so γ_text genuinely VARIES within blocks (a
# comparison field the blocking key saturates carries no information:
# EM would clamp its m = u and learn nothing from it)
BLOCK_LEN = 24
SCALE = 1_000_000_000  # probability micro-units (10^9)
N_ITER = 10
N_FIELDS = 3
_INIT_LAM = SCALE // 10
_INIT_M = 9 * SCALE // 10
_INIT_U = SCALE // 10


def _gamma_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs with their binary comparison vector."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        F.lower(F.substring("text", 1, NORM_LEN)).alias("norm"),
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"),
        F.col("norm").alias("norm_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("src_a"),
        F.substring("norm", 1, BLOCK_LEN).alias("bk"),
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"),
        F.col("norm").alias("norm_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("src_b"),
        F.substring("norm", 1, BLOCK_LEN).alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.col("norm_a") == F.col("norm_b"))
            .cast("int")
            .alias("g_text"),
            (F.col("lang_a") == F.col("lang_b"))
            .cast("int")
            .alias("g_lang"),
            (F.col("src_a") == F.col("src_b"))
            .cast("int")
            .alias("g_source"),
        )
    )


def _pattern_counts(gamma: DataFrame) -> DataFrame:
    return gamma.groupBy("g_text", "g_lang", "g_source").agg(
        F.count("*").alias("n_pairs")
    )


def _clamp(x: int) -> int:
    return min(SCALE - 1, max(1, x))


def _e_step(
    patterns: list[tuple[tuple[int, ...], int]],
    lam: int,
    m: list[int],
    u: list[int],
) -> list[tuple[tuple[int, ...], int, int]]:
    """(γ, n, resp) rows — fixed field order, integer multiply-shift."""
    rows = []
    for g, n in patterns:
        pm, pu = lam, SCALE - lam
        for k in range(N_FIELDS):
            pm = pm * (m[k] if g[k] else SCALE - m[k]) // SCALE
            pu = pu * (u[k] if g[k] else SCALE - u[k]) // SCALE
        resp = pm * SCALE // max(1, pm + pu)
        rows.append((g, n, resp))
    return rows


def _em(
    patterns: list[tuple[tuple[int, ...], int]],
) -> tuple[int, list[int], list[int], list[tuple[tuple[int, ...], int, int]]]:
    """N_ITER EM iterations + one final E-step; all exact integer math.

    Returns (λ, m[], u[], final (γ, n, resp) rows), every value in
    micro-units. The recurrence is mirrored verbatim by the unrolled
    CTE chain in ``_em_sql`` — any edit here must edit both.
    """
    lam, m, u = _INIT_LAM, [_INIT_M] * N_FIELDS, [_INIT_U] * N_FIELDS
    for _ in range(N_ITER):
        rows = _e_step(patterns, lam, m, u)
        tot = sum(n for _, n, _ in rows)
        sm = max(1, sum(n * r for _, n, r in rows))
        su = max(1, sum(n * (SCALE - r) for _, n, r in rows))
        lam = _clamp(sm // tot)
        m = [
            _clamp(
                sum(n * r for g, n, r in rows if g[k]) * SCALE // sm
            )
            for k in range(N_FIELDS)
        ]
        u = [
            _clamp(
                sum(n * (SCALE - r) for g, n, r in rows if g[k])
                * SCALE
                // su
            )
            for k in range(N_FIELDS)
        ]
    return lam, m, u, _e_step(patterns, lam, m, u)


def _fit(gamma: DataFrame):
    pat_rows = _pattern_counts(gamma).collect()  # ≤ 2^K rows, bounded
    # by the comparison-space cardinality, never by the data
    patterns = sorted(
        ((r["g_text"], r["g_lang"], r["g_source"]), r["n_pairs"])
        for r in pat_rows
    )
    return _em(patterns)


_MODEL_SCHEMA = T.StructType(
    [
        T.StructField("g_text", T.IntegerType(), False),
        T.StructField("g_lang", T.IntegerType(), False),
        T.StructField("g_source", T.IntegerType(), False),
        T.StructField("n_pairs", T.LongType(), False),
        T.StructField("match_resp_q", T.LongType(), False),
        T.StructField("lambda_q", T.LongType(), False),
        T.StructField("m_text_q", T.LongType(), False),
        T.StructField("u_text_q", T.LongType(), False),
        T.StructField("m_lang_q", T.LongType(), False),
        T.StructField("u_lang_q", T.LongType(), False),
        T.StructField("m_source_q", T.LongType(), False),
        T.StructField("u_source_q", T.LongType(), False),
    ]
)


def fs_em_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one row per observed γ-pattern: count, posterior
    match responsibility, and the converged (λ, m_k, u_k) — all integer
    micro-units (divide by SCALE for probabilities)."""
    lam, m, u, rows = _fit(_gamma_pairs(spark, sf_dir))
    out = [
        (g[0], g[1], g[2], n, resp, lam, m[0], u[0], m[1], u[1], m[2], u[2])
        for g, n, resp in rows
    ]
    return spark.createDataFrame(out, _MODEL_SCHEMA).orderBy(
        "g_text", "g_lang", "g_source"
    )


def fs_pair_posteriors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (id_a, id_b, γ, match_resp_q) for every candidate
    pair with posterior ≥ 1/2 — the probabilistic match edge list.

    The per-pattern posterior is a ≤ 2^K-row broadcast joined onto the
    blocked pair relation: the pairs are scored by ONE hash lookup, no
    re-scoring pass, no driver round-trip of pair rows. The γ relation
    is persisted so the blocked self-join runs ONCE — the EM's pattern
    aggregation and the posterior rejoin both read the materialized
    pairs (measured: the un-persisted form paid the join twice)."""
    gamma = _gamma_pairs(spark, sf_dir).persist()
    _, _, _, rows = _fit(gamma)
    resp_rel = spark.createDataFrame(
        [(g[0], g[1], g[2], resp) for g, _, resp in rows],
        T.StructType(
            [
                T.StructField("g_text", T.IntegerType(), False),
                T.StructField("g_lang", T.IntegerType(), False),
                T.StructField("g_source", T.IntegerType(), False),
                T.StructField("match_resp_q", T.LongType(), False),
            ]
        ),
    )
    return (
        gamma.join(F.broadcast(resp_rel), ["g_text", "g_lang", "g_source"])
        .filter(F.col("match_resp_q") >= SCALE // 2)
        .select(
            "id_a", "id_b", "g_text", "g_lang", "g_source", "match_resp_q"
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: the SAME integer recurrence, unrolled as CTEs in HUGEINT
# ---------------------------------------------------------------------------


def _pm_expr(src: str, pcte: str) -> str:
    """Chained multiply-shift for P(γ | class) in the FIXED field order —
    textual mirror of ``_e_step``'s loop."""
    num = f"{pcte}.lam"
    for k, col in enumerate(("g_text", "g_lang", "g_source"), start=1):
        agree = f"{pcte}.m{k}" if src == "m" else f"{pcte}.u{k}"
        base = num if k > 1 or src == "m" else f"({SCALE} - {pcte}.lam)"
        num = (
            f"(({base} * (CASE WHEN pat.{col} = 1 THEN {agree} "
            f"ELSE {SCALE} - {agree} END)) // {SCALE})"
        )
    return num


def _em_sql() -> str:
    """WITH-clause body: pat → p0 → (e1,p1) … (eN,pN) → efinal."""
    parts = [
        f"""docs AS (
  SELECT doc_id, lang, source, lower(substr(text, 1, {NORM_LEN})) AS norm
  FROM documents
),
gpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN a.norm = b.norm THEN 1 ELSE 0 END AS g_text,
         CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS g_lang,
         CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS g_source
  FROM docs a JOIN docs b
    ON substr(a.norm, 1, {BLOCK_LEN}) = substr(b.norm, 1, {BLOCK_LEN})
   AND a.doc_id < b.doc_id
),
pat AS (
  SELECT g_text, g_lang, g_source, CAST(count(*) AS HUGEINT) AS n
  FROM gpairs GROUP BY g_text, g_lang, g_source
),
p0 AS (
  SELECT CAST({_INIT_LAM} AS HUGEINT) AS lam,
         CAST({_INIT_M} AS HUGEINT) AS m1, CAST({_INIT_U} AS HUGEINT) AS u1,
         CAST({_INIT_M} AS HUGEINT) AS m2, CAST({_INIT_U} AS HUGEINT) AS u2,
         CAST({_INIT_M} AS HUGEINT) AS m3, CAST({_INIT_U} AS HUGEINT) AS u3
)"""
    ]
    for i in range(1, N_ITER + 1):
        p = f"p{i - 1}"
        # pm starts from lam, pu from SCALE - lam; _pm_expr handles both
        pm = _pm_expr("m", p)
        pu = _pm_expr("u", p)
        parts.append(
            f"""e{i} AS (
  SELECT g_text, g_lang, g_source, n,
         (pm * {SCALE}) // GREATEST(CAST(1 AS HUGEINT), pm + pu) AS resp
  FROM (
    SELECT pat.g_text, pat.g_lang, pat.g_source, pat.n,
           {pm} AS pm, {pu} AS pu
    FROM pat, {p}
  )
)"""
        )
        sums = f"""SELECT
     GREATEST(CAST(1 AS HUGEINT), sum(n * resp)) AS sm,
     GREATEST(CAST(1 AS HUGEINT), sum(n * ({SCALE} - resp))) AS su,
     sum(n) AS tot,
     sum(CASE WHEN g_text = 1 THEN n * resp ELSE CAST(0 AS HUGEINT) END) AS am1,
     sum(CASE WHEN g_lang = 1 THEN n * resp ELSE CAST(0 AS HUGEINT) END) AS am2,
     sum(CASE WHEN g_source = 1 THEN n * resp ELSE CAST(0 AS HUGEINT) END) AS am3,
     sum(CASE WHEN g_text = 1 THEN n * ({SCALE} - resp) ELSE CAST(0 AS HUGEINT) END) AS au1,
     sum(CASE WHEN g_lang = 1 THEN n * ({SCALE} - resp) ELSE CAST(0 AS HUGEINT) END) AS au2,
     sum(CASE WHEN g_source = 1 THEN n * ({SCALE} - resp) ELSE CAST(0 AS HUGEINT) END) AS au3
   FROM e{i}"""
        clamp = (
            lambda x: f"LEAST(CAST({SCALE - 1} AS HUGEINT), "
            f"GREATEST(CAST(1 AS HUGEINT), {x}))"
        )
        parts.append(
            f"""p{i} AS (
  SELECT {clamp('sm // tot')} AS lam,
         {clamp('(am1 * ' + str(SCALE) + ') // sm')} AS m1,
         {clamp('(au1 * ' + str(SCALE) + ') // su')} AS u1,
         {clamp('(am2 * ' + str(SCALE) + ') // sm')} AS m2,
         {clamp('(au2 * ' + str(SCALE) + ') // su')} AS u2,
         {clamp('(am3 * ' + str(SCALE) + ') // sm')} AS m3,
         {clamp('(au3 * ' + str(SCALE) + ') // su')} AS u3
  FROM ({sums})
)"""
        )
    pf = f"p{N_ITER}"
    parts.append(
        f"""efinal AS (
  SELECT g_text, g_lang, g_source, n,
         (pm * {SCALE}) // GREATEST(CAST(1 AS HUGEINT), pm + pu) AS resp
  FROM (
    SELECT pat.g_text, pat.g_lang, pat.g_source, pat.n,
           {_pm_expr('m', pf)} AS pm, {_pm_expr('u', pf)} AS pu
    FROM pat, {pf}
  )
)"""
    )
    return ",\n".join(parts)


FS_EM_WEIGHTS_SQL = f"""
WITH {_em_sql()}
SELECT CAST(e.g_text AS INT) AS g_text,
       CAST(e.g_lang AS INT) AS g_lang,
       CAST(e.g_source AS INT) AS g_source,
       CAST(e.n AS BIGINT) AS n_pairs,
       CAST(e.resp AS BIGINT) AS match_resp_q,
       CAST(p.lam AS BIGINT) AS lambda_q,
       CAST(p.m1 AS BIGINT) AS m_text_q, CAST(p.u1 AS BIGINT) AS u_text_q,
       CAST(p.m2 AS BIGINT) AS m_lang_q, CAST(p.u2 AS BIGINT) AS u_lang_q,
       CAST(p.m3 AS BIGINT) AS m_source_q, CAST(p.u3 AS BIGINT) AS u_source_q
FROM efinal e, p{N_ITER} p
ORDER BY g_text, g_lang, g_source
"""


FS_PAIR_POSTERIORS_SQL = f"""
WITH {_em_sql()}
SELECT g.id_a, g.id_b,
       CAST(g.g_text AS INT) AS g_text,
       CAST(g.g_lang AS INT) AS g_lang,
       CAST(g.g_source AS INT) AS g_source,
       CAST(e.resp AS BIGINT) AS match_resp_q
FROM gpairs g
JOIN efinal e
  ON g.g_text = e.g_text AND g.g_lang = e.g_lang
 AND g.g_source = e.g_source
WHERE e.resp >= {SCALE // 2}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# active-learning pair selection (uncertainty sampling over the posterior)
# ---------------------------------------------------------------------------

FS_LABEL_BUDGET = 50  # pairs surfaced per labeling round


def fs_uncertain_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the ``FS_LABEL_BUDGET`` candidate pairs whose converged
    Fellegi–Sunter posterior sits CLOSEST to 1/2 — uncertainty-sampling
    active learning (Settles 2009; the dedupe.io / Magellan labeling
    loop): each human label should go where the model is least sure, so
    the next EM round (with those pairs clamped) moves the decision
    boundary fastest.

    ``unc_q = |match_resp_q − SCALE/2|`` in the same integer micro-units
    as the EM itself — exact, order-independent. Global deterministic
    top-k: ORDER BY (unc_q, id_a, id_b) LIMIT k, which Spark plans as
    TakeOrderedAndProject — a per-partition heap of k rows then a k-row
    driver merge, NO global sort shuffle, safe at any pair count. The
    posterior lookup is the same ≤ 2^K-row broadcast as
    ``fs_pair_posteriors``; nothing new shuffles.

    Reference analog: none (the reference links against a fixed
    ontology; labeling-loop tooling is part of the grafted ER tier)."""
    gamma = _gamma_pairs(spark, sf_dir).persist()
    _, _, _, rows = _fit(gamma)
    resp_rel = spark.createDataFrame(
        [(g[0], g[1], g[2], resp) for g, _, resp in rows],
        T.StructType(
            [
                T.StructField("g_text", T.IntegerType(), False),
                T.StructField("g_lang", T.IntegerType(), False),
                T.StructField("g_source", T.IntegerType(), False),
                T.StructField("match_resp_q", T.LongType(), False),
            ]
        ),
    )
    half = SCALE // 2
    return (
        gamma.join(F.broadcast(resp_rel), ["g_text", "g_lang", "g_source"])
        .select(
            "id_a",
            "id_b",
            "g_text",
            "g_lang",
            "g_source",
            "match_resp_q",
            F.abs(F.col("match_resp_q") - F.lit(half)).alias("unc_q"),
        )
        .orderBy("unc_q", "id_a", "id_b")
        .limit(FS_LABEL_BUDGET)
    )


FS_UNCERTAIN_PAIRS_SQL = f"""
WITH {_em_sql()}
SELECT g.id_a, g.id_b,
       CAST(g.g_text AS INT) AS g_text,
       CAST(g.g_lang AS INT) AS g_lang,
       CAST(g.g_source AS INT) AS g_source,
       CAST(e.resp AS BIGINT) AS match_resp_q,
       CAST(abs(e.resp - {SCALE // 2}) AS BIGINT) AS unc_q
FROM gpairs g
JOIN efinal e
  ON g.g_text = e.g_text AND g.g_lang = e.g_lang
 AND g.g_source = e.g_source
ORDER BY unc_q, id_a, id_b
LIMIT {FS_LABEL_BUDGET}
"""


# ---------------------------------------------------------------------------
# mutual-best 1:1 matching (one synchronous round of distributed greedy)
# ---------------------------------------------------------------------------


def fs_mutual_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → the MUTUAL-BEST pairs of the Fellegi–Sunter-scored
    candidate graph: (id_a, id_b, match_resp_q) kept iff b is a's
    highest-posterior partner AND a is b's — one synchronous round of
    the classic distributed greedy matching (the locally-dominant-edge
    rule of Preis 1999 / the handshake step every parallel
    maximum-weight-matching algorithm opens with), i.e. the 1:1
    assignment a deployment runs when each record may link to AT MOST
    ONE other (master-record pairing), where threshold+CC would
    happily chain A−B−C into one cluster.

    Relational shape: score every blocked candidate pair by the same
    ≤ 2^K-row posterior broadcast as ``fs_pair_posteriors`` (NO ½
    filter — contention inside blocks is the point), symmetrize the
    edge list (one union — each direction carries its partner), take
    each node's argmax by (posterior DESC, partner id ASC — posteriors
    are pattern-level so ties are pervasive and the id tiebreak makes
    the matching DETERMINISTIC), and keep edges whose two endpoints
    chose each other. Scale: the symmetrized relation is 2|E|; the
    argmax is one window per node partition; the handshake is an
    equi-join of the best-choice relation with itself — all linear in
    edges, no iteration (rounds 2+ would re-run on unmatched residue;
    round 1 is the operator because it already yields a maximal-in-
    practice matching on near-dup graphs and is what the one-pass
    deployments run).

    Reference analog: none — the reference ranks ontology candidates
    per mention (one-sided argmax, W2/A3); the SYMMETRIC handshake is
    the grafted ER tier's 1:1 constraint.
    """
    gamma = _gamma_pairs(spark, sf_dir).persist()
    _, _, _, rows = _fit(gamma)
    resp_rel = spark.createDataFrame(
        [(g[0], g[1], g[2], resp) for g, _, resp in rows],
        T.StructType(
            [
                T.StructField("g_text", T.IntegerType(), False),
                T.StructField("g_lang", T.IntegerType(), False),
                T.StructField("g_source", T.IntegerType(), False),
                T.StructField("match_resp_q", T.LongType(), False),
            ]
        ),
    )
    edges = gamma.join(
        F.broadcast(resp_rel), ["g_text", "g_lang", "g_source"]
    ).select("id_a", "id_b", "match_resp_q")
    return mutual_best_over(edges, "match_resp_q")


def mutual_best_over(edges: DataFrame, w: str) -> DataFrame:
    """Generic handshake core over ANY undirected weighted edge list
    (id_a, id_b, w): keep edges whose endpoints are each other's
    argmax by (w DESC, partner id ASC)."""
    sym = edges.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v"), w
    ).unionByName(
        edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"), w)
    )
    # per-endpoint argmax as a partially-aggregatable max_by over the
    # (w DESC, partner ASC) total order — the unique max of struct(w, -v)
    # is exactly the r5 row_number window's first row, without sorting
    # every endpoint's edge list; lazily checkpointed because the
    # handshake below references it twice (no cache-manager matching)
    best = (
        sym.groupBy("u")
        .agg(
            F.max_by(
                F.struct(F.col("v"), F.col(w)),
                F.struct(F.col(w), (-F.col("v"))),
            ).alias("_b")
        )
        .select("u", F.col("_b.v").alias("v"), F.col(f"_b.{w}").alias(w))
        .localCheckpoint(eager=False)
    )
    other = best.select(F.col("u").alias("v2"), F.col("v").alias("u2"))
    return (
        best.join(
            other, (F.col("u") == F.col("u2")) & (F.col("v") == F.col("v2"))
        )
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("id_a"), F.col("v").alias("id_b"), w)
        .orderBy("id_a", "id_b")
    )


FS_MUTUAL_MATCH_SQL = f"""
WITH {_em_sql()},
edges AS (
  SELECT g.id_a, g.id_b, CAST(e.resp AS BIGINT) AS match_resp_q
  FROM gpairs g
  JOIN efinal e
    ON g.g_text = e.g_text AND g.g_lang = e.g_lang
   AND g.g_source = e.g_source
),
sym AS (
  SELECT id_a AS u, id_b AS v, match_resp_q FROM edges
  UNION ALL
  SELECT id_b AS u, id_a AS v, match_resp_q FROM edges
),
best AS (
  SELECT u, v, match_resp_q FROM (
    SELECT u, v, match_resp_q,
           row_number() OVER (PARTITION BY u
                              ORDER BY match_resp_q DESC, v ASC) AS rn
    FROM sym
  ) WHERE rn = 1
)
SELECT a.u AS id_a, a.v AS id_b, a.match_resp_q
FROM best a JOIN best b ON a.u = b.v AND a.v = b.u
WHERE a.u < a.v
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------------
# term-frequency-adjusted posteriors (Splink's tf adjustment)
# ---------------------------------------------------------------------------


def _value_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked candidate pairs carrying the γ vector AND the agreed
    field values (needed to look up their term frequencies)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        F.lower(F.substring("text", 1, NORM_LEN)).alias("norm"),
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"),
        F.col("norm").alias("norm_a"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("src_a"),
        F.substring("norm", 1, BLOCK_LEN).alias("bk"),
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"),
        F.col("norm").alias("norm_b"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("src_b"),
        F.substring("norm", 1, BLOCK_LEN).alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "norm_a",
            "lang_a",
            "src_a",
            (F.col("norm_a") == F.col("norm_b")).cast("int").alias("g_text"),
            (F.col("lang_a") == F.col("lang_b")).cast("int").alias("g_lang"),
            (F.col("src_a") == F.col("src_b")).cast("int").alias("g_source"),
        )
    )


def fs_tf_posteriors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (id_a, id_b, γ, match_resp_q, match_resp_tf_q):
    the FS posterior WITH Splink-style term-frequency adjustment.

    The classical model scores agreement on a field with one global
    u_k — the probability two RANDOM records agree. But agreeing on
    ``lang = 'en'`` is weak evidence while agreeing on ``lang = 'xx'``
    is strong: the honest u for agreement on a SPECIFIC value v is
    that value's own frequency. Splink ships exactly this adjustment
    (term_frequency_adjustments); here it is integer-exact: for each
    field where the pair AGREES on value v,

        u_k(v) = clamp(freq_k(v) · SCALE div N, 1, SCALE − 1)

    replaces u_k in the u-chain (disagreement keeps the global
    ``SCALE − u_k`` — tf says nothing about how records disagree, the
    same asymmetry Splink applies); the m-chain is untouched. The
    pair posterior is then the SAME multiply-shift chain as
    ``fs_pair_posteriors``, with the EM's converged parameters
    embedded as literals.

    Pattern-level broadcast scoring is structurally impossible here —
    the posterior depends on VALUES, not just the γ-pattern — so the
    plan is the honest value-keyed one: three frequency relations
    (one map-side-combinable count each), the two small ones
    broadcast, the text-norm one a linear keyed join; the tf product
    ``cnt · SCALE`` is widened to decimal(38,0)/HUGEINT (int64 would
    overflow past ~9e9 rows). Output keeps BOTH posteriors so the
    adjustment is auditable pair by pair; the match decision
    (≥ SCALE/2) is taken on the ADJUSTED score.

    Reference analog: none — learned-similarity linkers absorb value
    rarity into the encoder; tf adjustment is the grafted ER tier
    (Splink's flagship feature on exactly this kind of field set).
    """
    dec = "decimal(38,0)"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        F.lower(F.substring("text", 1, NORM_LEN)).alias("norm"),
    )
    n_docs = docs.count()  # O(1) scalar, needed as a literal denominator
    tf = {}
    for field, col in (("text", "norm"), ("lang", "lang"),
                       ("source", "source")):
        tf[field] = docs.groupBy(F.col(col).alias(f"v_{field}")).agg(
            F.expr(
                f"least({SCALE} - 1, greatest(1, cast(count(*) as {dec})"
                f" * {SCALE} div {n_docs}))"
            )
            .cast("bigint")
            .alias(f"tf_{field}")
        )
    vp = _value_pairs(spark, sf_dir).persist()
    lam, m, u, _ = _fit(
        vp.select("id_a", "id_b", "g_text", "g_lang", "g_source")
    )
    scored = (
        vp.join(
            tf["text"].withColumnRenamed("v_text", "norm_a"), "norm_a"
        )
        .join(
            F.broadcast(
                tf["lang"].withColumnRenamed("v_lang", "lang_a")
            ),
            "lang_a",
        )
        .join(
            F.broadcast(
                tf["source"].withColumnRenamed("v_source", "src_a")
            ),
            "src_a",
        )
    )
    # the SAME fixed-order multiply-shift chain as _e_step / _pm_expr,
    # with converged parameters as literals; tf_* replaces u_* in the
    # u-chain on agreement only
    gcols = ("g_text", "g_lang", "g_source")
    tcols = ("tf_text", "tf_lang", "tf_source")
    # seed as bigint so the whole multiply-shift chain promotes (bare
    # int literals are 32-bit in Spark SQL and the products overflow)
    pm = f"cast({lam} as bigint)"
    pu_base = f"cast({SCALE - lam} as bigint)"
    pu_tf = pu_base
    for k, g in enumerate(gcols):
        pm = (
            f"(({pm} * (CASE WHEN {g} = 1 THEN {m[k]} "
            f"ELSE {SCALE - m[k]} END)) div {SCALE})"
        )
        pu_base = (
            f"(({pu_base} * (CASE WHEN {g} = 1 THEN {u[k]} "
            f"ELSE {SCALE - u[k]} END)) div {SCALE})"
        )
        pu_tf = (
            f"(({pu_tf} * (CASE WHEN {g} = 1 THEN {tcols[k]} "
            f"ELSE {SCALE - u[k]} END)) div {SCALE})"
        )
    resp = f"(({pm}) * {SCALE}) div greatest(1, ({pm}) + ({pu_base}))"
    resp_tf = f"(({pm}) * {SCALE}) div greatest(1, ({pm}) + ({pu_tf}))"
    return (
        scored.select(
            "id_a",
            "id_b",
            "g_text",
            "g_lang",
            "g_source",
            F.expr(resp).cast("bigint").alias("match_resp_q"),
            F.expr(resp_tf).cast("bigint").alias("match_resp_tf_q"),
        )
        .filter(F.col("match_resp_tf_q") >= SCALE // 2)
        .orderBy("id_a", "id_b")
    )


def _tf_sql() -> str:
    """The oracle's mirror: per-pair chains recomputed from p{N_ITER}
    (HUGEINT all the way; same fixed field order, tf on agreement)."""
    gcols = ("g_text", "g_lang", "g_source")
    tcols = ("tf_text", "tf_lang", "tf_source")
    pm = f"CAST(p.lam AS HUGEINT)"
    pu_base = f"CAST({SCALE} - p.lam AS HUGEINT)"
    pu_tf = pu_base
    for k, g in enumerate(gcols, start=1):
        pm = (
            f"(({pm} * (CASE WHEN v.{gcols[k-1]} = 1 THEN p.m{k} "
            f"ELSE {SCALE} - p.m{k} END)) // {SCALE})"
        )
        pu_base = (
            f"(({pu_base} * (CASE WHEN v.{gcols[k-1]} = 1 THEN p.u{k} "
            f"ELSE {SCALE} - p.u{k} END)) // {SCALE})"
        )
        pu_tf = (
            f"(({pu_tf} * (CASE WHEN v.{gcols[k-1]} = 1 "
            f"THEN CAST(v.{tcols[k-1]} AS HUGEINT) "
            f"ELSE {SCALE} - p.u{k} END)) // {SCALE})"
        )
    return (
        f"(({pm}) * {SCALE}) // GREATEST(CAST(1 AS HUGEINT),"
        f" ({pm}) + ({pu_base})) AS resp,"
        f" (({pm}) * {SCALE}) // GREATEST(CAST(1 AS HUGEINT),"
        f" ({pm}) + ({pu_tf})) AS resp_tf"
    )


FS_TF_POSTERIORS_SQL = f"""
WITH {_em_sql()},
nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM docs),
tfn AS (
  SELECT norm AS v, LEAST({SCALE} - 1, GREATEST(1,
           CAST(count(*) AS HUGEINT) * {SCALE} // (SELECT n FROM nn)))
         AS tf_text
  FROM docs GROUP BY norm
),
tfl AS (
  SELECT lang AS v, LEAST({SCALE} - 1, GREATEST(1,
           CAST(count(*) AS HUGEINT) * {SCALE} // (SELECT n FROM nn)))
         AS tf_lang
  FROM docs GROUP BY lang
),
tfs AS (
  SELECT source AS v, LEAST({SCALE} - 1, GREATEST(1,
           CAST(count(*) AS HUGEINT) * {SCALE} // (SELECT n FROM nn)))
         AS tf_source
  FROM docs GROUP BY source
),
vpairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.norm AS norm_a, a.lang AS lang_a, a.source AS src_a,
         CASE WHEN a.norm = b.norm THEN 1 ELSE 0 END AS g_text,
         CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END AS g_lang,
         CASE WHEN a.source = b.source THEN 1 ELSE 0 END AS g_source
  FROM docs a JOIN docs b
    ON substr(a.norm, 1, {BLOCK_LEN}) = substr(b.norm, 1, {BLOCK_LEN})
   AND a.doc_id < b.doc_id
),
v AS (
  SELECT vp.*, tfn.tf_text, tfl.tf_lang, tfs.tf_source
  FROM vpairs vp
  JOIN tfn ON tfn.v = vp.norm_a
  JOIN tfl ON tfl.v = vp.lang_a
  JOIN tfs ON tfs.v = vp.src_a
)
SELECT id_a, id_b,
       CAST(g_text AS INT) AS g_text,
       CAST(g_lang AS INT) AS g_lang,
       CAST(g_source AS INT) AS g_source,
       CAST(resp AS BIGINT) AS match_resp_q,
       CAST(resp_tf AS BIGINT) AS match_resp_tf_q
FROM (
  SELECT v.id_a, v.id_b, v.g_text, v.g_lang, v.g_source, {_tf_sql()}
  FROM v, p{N_ITER} p
)
WHERE resp_tf >= {SCALE // 2}
ORDER BY id_a, id_b
"""
