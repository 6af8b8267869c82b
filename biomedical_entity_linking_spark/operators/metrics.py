"""Ranked-candidate evaluation metrics: three-mode recall, MAP@k,
precision@k.

Reference semantics (``bioel/bioel/evaluate.py``):

* ``min_hit_index(gold, candidates, mode)`` (``:203-231``) — candidates is
  a RANKED LIST OF SYNONYM SETS (``array<array<string>>``); the hit index
  is 0-based; misses return the 1000000 sentinel (``:209,231``); the
  ``candidates == [[]]`` guard returns the sentinel outright (``:209``).
  - ``basic`` (``:211-217``): flatten the synsets preserving first
    occurrence (``list_flatten`` ``:191-200``), first index whose element
    is in gold.
  - ``strict`` (``:218-221``): first synset index where ALL elements are
    in gold (note: ``all([])`` is True — an empty synset hits).
  - ``relaxed`` (``:222-227``): first synset index where ANY element is in
    gold.
* ``recall_at_k = (hit < k).mean()`` (``:256-258``).
* ``precision_at_k_DK = (hit <= k-1).mean()`` (``:288-302``) and
  ``precision_at_k = Σ 1/k [hit<k] / n`` (``:305-320``).
* ``MAP@k = mean(hit <= k-1 ? 1/(hit+1) : 0)`` (``:323-351``).

All three hit modes are pure Catalyst higher-order functions (aggregate /
forall / exists over nested arrays) — no UDFs, whole-stage codegen, and a
DuckDB oracle replicates them relationally (unnest + window dedup).

Candidate construction here: per query vector, the cosine top-6 neighbors
(EXACT — ``exact_cosine_topk`` via the per-session ``cached_exact_topk``
memo, never the ANN dispatch: the oracles are exact) grouped into 3 ranked
synonym sets of
2 labels each (sorted within the set for determinism); gold = the query's
own label as a 1-element array. This mirrors the reference's
candidates-as-synsets shape (``scispacy/evaluate.py:99-100`` equivalent-CUI
synset expansion) while exercising forall/exists over genuinely nested
arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import cached_exact_topk

MISS_SENTINEL = 1000000  # reference: bioel/bioel/evaluate.py:209
N_NEIGHBORS = 6
SYNSET_SIZE = 2
MAX_K = 4


# ---------------------------------------------------------------------------
# hit-index expressions (generic over gold: array<string>,
# candidates: array<array<string>>)
# ---------------------------------------------------------------------------

def _no_candidates(cand):
    """The reference's ``candidates == [[]]`` guard (evaluate.py:209)."""
    return (F.size(cand) == 1) & (F.size(F.element_at(cand, 1)) == 0)


def _first_index(arr, pred):
    """0-based index of the first element satisfying ``pred``, else the
    miss sentinel — transform-with-index + filter + element_at (all
    Catalyst higher-order fns, no explode)."""
    idxs = F.filter(
        F.transform(arr, lambda x, i: F.when(pred(x), i)),
        lambda v: v.isNotNull(),
    )
    # F.get is null-on-out-of-bounds (ANSI element_at throws on empty)
    return F.coalesce(F.get(idxs, 0), F.lit(MISS_SENTINEL))


def ordered_dedup(arr):
    """Flatten-preserving-first-occurrence (reference ``list_flatten``,
    evaluate.py:191-200) over an already-flat array."""
    return F.aggregate(
        arr,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )


def hit_basic(gold, cand):
    flat = ordered_dedup(F.flatten(cand))
    return F.when(_no_candidates(cand), F.lit(MISS_SENTINEL)).otherwise(
        _first_index(flat, lambda x: F.array_contains(gold, x))
    )


def hit_strict(gold, cand):
    return F.when(_no_candidates(cand), F.lit(MISS_SENTINEL)).otherwise(
        _first_index(
            cand, lambda ss: F.forall(ss, lambda y: F.array_contains(gold, y))
        )
    )


def hit_relaxed(gold, cand):
    return F.when(_no_candidates(cand), F.lit(MISS_SENTINEL)).otherwise(
        _first_index(
            cand, lambda ss: F.exists(ss, lambda y: F.array_contains(gold, y))
        )
    )


# ---------------------------------------------------------------------------
# candidate relation from the embeddings table
# ---------------------------------------------------------------------------

def candidate_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, gold array<string>, candidates array<array<string>>).

    Synset g (0-based) = sorted labels of cosine neighbors at ranks
    2g+1..2g+2."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # labels as strings — gold db_ids are strings in the reference schema
    # (bigbio_utils.py:214-216)
    labels = emb.select("vec_id", F.col("label").cast("string").alias("label"))
    # EXACT neighbors, shared+persisted across the whole metric family —
    # the oracles are exact, so the ANN dispatch (cosine_topk) must not be
    # used here; exact_cosine_topk fails loudly above its cap instead of
    # silently approximating
    nn = cached_exact_topk(spark, sf_dir, k=N_NEIGHBORS)
    nb = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    ranked = (
        nn.join(nb, "neighbor_id")
        .groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "n_label"))
            ).alias("seq")
        )
    )
    # index `seq` per synset position instead of slicing a lowered label
    # array: a staged `transform(seq, s -> s.n_label)` column is re-inlined
    # by CollapseProject (single reference), putting an O(k) loop-invariant
    # transform inside the synset lambda — O(k^2) per row. F.get is 0-based
    # and NULL-safe out of bounds (ANSI-proof); array_compact restores the
    # slice semantics (short trailing synsets) when a query has < k
    # neighbors. Caught by plans.staging_lint.
    n_synsets = N_NEIGHBORS // SYNSET_SIZE
    synsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_synsets - 1)),
        lambda g: F.array_sort(
            F.array_compact(
                F.transform(
                    F.sequence(
                        g * SYNSET_SIZE, g * SYNSET_SIZE + (SYNSET_SIZE - 1)
                    ),
                    lambda i: F.get(F.col("seq"), i)["n_label"],
                )
            )
        ),
    )
    qa = labels.select("vec_id", F.array(F.col("label")).alias("gold"))
    return ranked.join(qa, "vec_id").select(
        "vec_id", "gold", synsets.alias("candidates")
    )


_HIT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _hit_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(session, sf_dir) memoized + persisted hit relation: the five
    metric queries (recall_modes, map_at_k, precision_at_k,
    failure_attribution, chi_square_flags) consume identical hit indexes —
    without the memo each rebuilt candidate_relation → neighbor join from
    scratch (5× the same work per bench pass)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _HIT_CACHE.get(key)
    if df is None:
        cand = candidate_relation(spark, sf_dir)
        g, c = F.col("gold"), F.col("candidates")
        df = cand.select(
            "vec_id",
            hit_basic(g, c).alias("hit_basic"),
            hit_strict(g, c).alias("hit_strict"),
            hit_relaxed(g, c).alias("hit_relaxed"),
        ).persist()
        df.count()  # materialize once; all five queries share it
        _HIT_CACHE[key] = df
    return df


# ---------------------------------------------------------------------------
# metric queries
# ---------------------------------------------------------------------------

def recall_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k per eval mode (basic / strict / relaxed), k = 1..MAX_K."""
    hits = _hit_relation(spark, sf_dir)
    ks = spark.range(1, MAX_K + 1).select(F.col("id").cast("int").alias("k"))
    per_mode = [
        hits.select(
            F.lit(mode).alias("mode"), F.col(f"hit_{mode}").alias("hit")
        )
        for mode in ("basic", "strict", "relaxed")
    ]
    stacked = per_mode[0].unionByName(per_mode[1]).unionByName(per_mode[2])
    return (
        stacked.crossJoin(ks)
        .groupBy("mode", "k")
        .agg(
            F.round(
                F.avg(F.when(F.col("hit") < F.col("k"), 1.0).otherwise(0.0)), 6
            ).alias("recall_at_k"),
            F.count("*").alias("n_queries"),
        )
        .orderBy("mode", "k")
    )


def map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP@k (basic mode), k = 1..MAX_K: mean of 1/(hit+1) when hit < k
    else 0 (reference evaluate.py:323-351)."""
    hits = _hit_relation(spark, sf_dir)
    ks = spark.range(1, MAX_K + 1).select(F.col("id").cast("int").alias("k"))
    ap = F.when(
        F.col("hit_basic") <= F.col("k") - 1, 1.0 / (F.col("hit_basic") + 1)
    ).otherwise(0.0)
    return (
        hits.crossJoin(ks)
        .groupBy("k")
        .agg(
            F.round(F.avg(ap), 6).alias("map_at_k"),
            F.count("*").alias("n_queries"),
        )
        .orderBy("k")
    )


def precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both precision@k variants (basic mode), k = 1..MAX_K:
    ``precision_dk`` = mean(hit <= k-1) (evaluate.py:288-302);
    ``precision`` = Σ 1/k over hits<k, / n (evaluate.py:305-320)."""
    hits = _hit_relation(spark, sf_dir)
    ks = spark.range(1, MAX_K + 1).select(F.col("id").cast("int").alias("k"))
    within = F.when(F.col("hit_basic") <= F.col("k") - 1, 1.0).otherwise(0.0)
    return (
        hits.crossJoin(ks)
        .groupBy("k")
        .agg(
            F.round(F.avg(within), 6).alias("precision_dk"),
            F.round(F.sum(within / F.col("k")) / F.count("*"), 6).alias(
                "precision"
            ),
            F.count("*").alias("n_queries"),
        )
        .orderBy("k")
    )


K_ATTR = 3  # the k cutoff the reference's detailed analysis uses


def _typed_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hit relation + a categorical ``type`` column (label mod 3 — the
    synthetic analog of the reference's entity types)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    types = emb.select(
        "vec_id",
        F.concat(F.lit("t"), (F.col("label") % 3).cast("string")).alias("type"),
    )
    return _hit_relation(spark, sf_dir).join(types, "vec_id")


def failure_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CG-vs-NED failure attribution per type (reference
    ``evaluate.py:736-777``): miss_CG = hit > k (candidate generation never
    surfaced gold); miss_NED = hit <= k and hit != 0 (gold retrieved but
    not ranked first); success = hit == 0; hit_k = hit < k; plus
    accuracy_per_type and recall_k_per_type."""
    hits = _typed_hits(spark, sf_dir)
    h = F.col("hit_basic")
    return (
        hits.groupBy("type")
        .agg(
            F.count("*").alias("n_mentions"),
            F.sum(F.when(h > K_ATTR, 1).otherwise(0)).alias("n_miss_cg"),
            F.sum(F.when((h <= K_ATTR) & (h != 0), 1).otherwise(0)).alias(
                "n_miss_ned"
            ),
            F.sum(F.when(h == 0, 1).otherwise(0)).alias("n_success"),
            F.sum(F.when(h < K_ATTR, 1).otherwise(0)).alias("n_hit_k"),
        )
        .select(
            "type",
            "n_mentions",
            "n_miss_cg",
            "n_miss_ned",
            "n_success",
            "n_hit_k",
            F.round(F.col("n_success") / F.col("n_mentions"), 6).alias(
                "accuracy"
            ),
            F.round(F.col("n_hit_k") / F.col("n_mentions"), 6).alias(
                "recall_k"
            ),
        )
        .orderBy("type")
    )


def chi_square_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: Pearson chi-square statistics for the type × CG and type × NED
    contingency tables (reference ``evaluate.py:818-851`` — crosstab +
    ``chi2_contingency``). The statistic and dof are pure relational math:
    expected cell = row_total·col_total/n; chi2 = Σ (o−e)²/e over the full
    type × flag grid including zero observed cells."""
    import numpy as np

    hits = _typed_hits(spark, sf_dir)
    flagged = hits.select(
        "type",
        F.when(F.col("hit_basic") != MISS_SENTINEL, 1).otherwise(0).alias("cg"),
        F.when(F.col("hit_basic") == 0, 1).otherwise(0).alias("ned"),
    )
    # one distributed agg → tiny (type, cg, ned-partitioned) counts to the
    # driver; chi2 math in numpy on the collected crosstab (SURVEY A9)
    rows = (
        flagged.groupBy("type", "cg", "ned").agg(F.count("*").alias("o")).collect()
    )

    def chi2_stat(flag_key: str):
        types = sorted({r["type"] for r in rows})
        flags = sorted({r[flag_key] for r in rows})
        obs = np.zeros((len(types), len(flags)), dtype=np.float64)
        for r in rows:
            obs[types.index(r["type"]), flags.index(r[flag_key])] += r["o"]
        n = obs.sum()
        expected = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
        stat = float(((obs - expected) ** 2 / expected).sum())
        dof = (len(types) - 1) * (len(flags) - 1)
        return stat, dof

    chi_cg, dof_cg = chi2_stat("cg")
    chi_ned, dof_ned = chi2_stat("ned")
    n = int(sum(r["o"] for r in rows))
    return spark.createDataFrame(
        [(round(chi_cg, 6), dof_cg, round(chi_ned, 6), dof_ned, n)],
        "chi2_cg double, dof_cg int, chi2_ned double, dof_ned int, n long",
    )


# ---------------------------------------------------------------------------
# DuckDB oracles — the same math relationally (unnest + window dedup)
# ---------------------------------------------------------------------------

_HITS_CTE = f"""
e AS (
  SELECT vec_id, CAST(label AS VARCHAR) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
),
nn AS (
  SELECT a.vec_id, a.label AS q_label, b.label AS n_label,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))) DESC,
                    b.vec_id) AS rank
  FROM e a, e b
  WHERE a.vec_id <> b.vec_id
  QUALIFY rank <= {N_NEIGHBORS}
),
ss AS (  -- synset g = sorted labels at ranks 2g+1..2g+2
  -- floor(): DuckDB '/' is float division and CAST rounds half away,
  -- while Spark's cast truncates — floor makes both integer-divide
  SELECT vec_id, q_label,
         CAST(floor((rank - 1) / {SYNSET_SIZE}) AS INT) AS g,
         list_sort(list(n_label)) AS labs
  FROM nn
  GROUP BY vec_id, q_label, CAST(floor((rank - 1) / {SYNSET_SIZE}) AS INT)
),
fl AS (  -- flatten synsets in (g, within-set) order
  SELECT vec_id, q_label,
         g * {SYNSET_SIZE} + i - 1 AS pos,
         labs[i] AS lab
  FROM (SELECT vec_id, q_label, g, labs,
               unnest(labs) AS _z,
               unnest(generate_series(1, len(labs))) AS i
        FROM ss)
),
dd AS (  -- first-occurrence dedup then re-rank (list_flatten semantics)
  SELECT vec_id, q_label, lab,
         row_number() OVER (PARTITION BY vec_id ORDER BY min(pos)) - 1 AS idx
  FROM fl
  GROUP BY vec_id, q_label, lab
),
hb AS (
  SELECT vec_id,
         coalesce(min(CASE WHEN lab = q_label THEN idx END),
                  {MISS_SENTINEL}) AS hit_basic
  FROM dd GROUP BY vec_id
),
hs AS (
  SELECT vec_id,
         coalesce(min(CASE WHEN len(list_filter(labs, y -> y <> q_label)) = 0
                           THEN g END), {MISS_SENTINEL}) AS hit_strict,
         coalesce(min(CASE WHEN list_contains(labs, q_label)
                           THEN g END), {MISS_SENTINEL}) AS hit_relaxed
  FROM ss GROUP BY vec_id
),
hits AS (
  SELECT vec_id, hit_basic, hit_strict, hit_relaxed
  FROM hb JOIN hs USING (vec_id)
)
"""

RECALL_MODES_SQL = f"""
WITH {_HITS_CTE},
stacked AS (
  SELECT 'basic' AS mode, hit_basic AS hit FROM hits
  UNION ALL SELECT 'strict', hit_strict FROM hits
  UNION ALL SELECT 'relaxed', hit_relaxed FROM hits
)
SELECT mode, CAST(k AS INT) AS k,
       round(avg(CASE WHEN hit < k THEN 1.0 ELSE 0.0 END), 6) AS recall_at_k,
       count(*) AS n_queries
FROM stacked, range(1, {MAX_K + 1}) r(k)
GROUP BY mode, k
ORDER BY mode, k
"""

MAP_AT_K_SQL = f"""
WITH {_HITS_CTE}
SELECT CAST(k AS INT) AS k,
       round(avg(CASE WHEN hit_basic <= k - 1 THEN 1.0 / (hit_basic + 1)
                      ELSE 0.0 END), 6) AS map_at_k,
       count(*) AS n_queries
FROM hits, range(1, {MAX_K + 1}) r(k)
GROUP BY k
ORDER BY k
"""

_TYPED_HITS_CTE = f"""
{_HITS_CTE},
typed AS (
  SELECT h.vec_id, h.hit_basic,
         't' || CAST(emb.label % 3 AS VARCHAR) AS type
  FROM hits h JOIN embeddings emb ON emb.vec_id = h.vec_id
)
"""

FAILURE_ATTRIBUTION_SQL = f"""
WITH {_TYPED_HITS_CTE}
SELECT type,
       count(*) AS n_mentions,
       CAST(sum(CASE WHEN hit_basic > {K_ATTR} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_miss_cg,
       CAST(sum(CASE WHEN hit_basic <= {K_ATTR} AND hit_basic <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_miss_ned,
       CAST(sum(CASE WHEN hit_basic = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_success,
       CAST(sum(CASE WHEN hit_basic < {K_ATTR} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit_k,
       round(sum(CASE WHEN hit_basic = 0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS accuracy,
       round(sum(CASE WHEN hit_basic < {K_ATTR} THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS recall_k
FROM typed
GROUP BY type
ORDER BY type
"""

CHI_SQUARE_FLAGS_SQL = f"""
WITH {_TYPED_HITS_CTE},
flagged AS (
  SELECT type,
         CASE WHEN hit_basic <> {MISS_SENTINEL} THEN 1 ELSE 0 END AS cg,
         CASE WHEN hit_basic = 0 THEN 1 ELSE 0 END AS ned
  FROM typed
),
grid_cg AS (
  SELECT t.type, f.cg FROM (SELECT DISTINCT type FROM flagged) t,
                           (SELECT DISTINCT cg FROM flagged) f
),
obs_cg AS (
  SELECT g.type, g.cg, coalesce(o.o, 0) AS o
  FROM grid_cg g
  LEFT JOIN (SELECT type, cg, count(*) AS o FROM flagged GROUP BY 1, 2) o
    USING (type, cg)
),
chi_cg AS (
  SELECT round(sum(pow(o - rt * ct / n, 2) / (rt * ct / n)), 6) AS chi2,
         CAST((count(DISTINCT type) - 1) * (count(DISTINCT cg) - 1) AS INT)
           AS dof
  FROM (SELECT type, cg, o,
               sum(o) OVER (PARTITION BY type) AS rt,
               sum(o) OVER (PARTITION BY cg) AS ct,
               sum(o) OVER () AS n
        FROM obs_cg)
),
grid_ned AS (
  SELECT t.type, f.ned FROM (SELECT DISTINCT type FROM flagged) t,
                            (SELECT DISTINCT ned FROM flagged) f
),
obs_ned AS (
  SELECT g.type, g.ned, coalesce(o.o, 0) AS o
  FROM grid_ned g
  LEFT JOIN (SELECT type, ned, count(*) AS o FROM flagged GROUP BY 1, 2) o
    USING (type, ned)
),
chi_ned AS (
  SELECT round(sum(pow(o - rt * ct / n, 2) / (rt * ct / n)), 6) AS chi2,
         CAST((count(DISTINCT type) - 1) * (count(DISTINCT ned) - 1) AS INT)
           AS dof
  FROM (SELECT type, ned, o,
               sum(o) OVER (PARTITION BY type) AS rt,
               sum(o) OVER (PARTITION BY ned) AS ct,
               sum(o) OVER () AS n
        FROM obs_ned)
)
SELECT chi_cg.chi2 AS chi2_cg, chi_cg.dof AS dof_cg,
       chi_ned.chi2 AS chi2_ned, chi_ned.dof AS dof_ned,
       (SELECT count(*) FROM flagged) AS n
FROM chi_cg, chi_ned
"""

PRECISION_AT_K_SQL = f"""
WITH {_HITS_CTE}
SELECT CAST(k AS INT) AS k,
       round(avg(CASE WHEN hit_basic <= k - 1 THEN 1.0 ELSE 0.0 END), 6)
         AS precision_dk,
       round(sum(CASE WHEN hit_basic <= k - 1 THEN 1.0 / k ELSE 0.0 END)
             / count(*), 6) AS precision,
       count(*) AS n_queries
FROM hits, range(1, {MAX_K + 1}) r(k)
GROUP BY k
ORDER BY k
"""
