"""Evaluation + scalar-operator coverage queries.

Implements the reference's labeled-candidate evaluation semantics over the
synthetic lakehouse tables:

* ``knn_label_recall`` — recall@k with a first-hit index and a miss
  sentinel, the reference's core metric (``bioel/bioel/evaluate.py:203-260``:
  ``min_hit_index`` + ``recall_at_k = (hit < k).mean()``; sentinel 1000000
  at ``:209,231``). Candidates come from the exact cosine top-k join
  (J9/J11 analog), gold label from the ``embeddings.label`` column.
* ``content_tokens`` — the exclusion-filter family (P4: drop blocklisted
  ids then drop rows emptied, ``bigbio_utils.py:229-235``; P5: dict remap
  with identity fallback, ``bigbio_utils.py:221-227``) re-expressed over
  document tokens and the lang column.
* ``props_value_stats`` — F17 json parse (``ujson`` throughout the
  reference) via ``get_json_object`` on the events ``props`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import TOP_K, cached_exact_topk

MISS_SENTINEL = 1000000  # reference: bioel/bioel/evaluate.py:209


def knn_label_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k for k = 1..TOP_K over exact cosine neighbors.

    first_hit = min rank whose neighbor shares the query's label, else the
    miss sentinel; recall@k = avg(first_hit <= k)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = emb.select("vec_id", "label")
    # reuse the metric family's shared exact top-6 relation (exact ranks
    # ≤ TOP_K are identical to an exact top-TOP_K run), one neighbor join
    # per session instead of one per query
    from .metrics import N_NEIGHBORS

    nn = cached_exact_topk(spark, sf_dir, k=max(TOP_K, N_NEIGHBORS)).filter(
        F.col("rank") <= TOP_K
    )
    qa = labels.select(F.col("vec_id"), F.col("label").alias("q_label"))
    nb = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    hits = (
        nn.join(qa, "vec_id")
        .join(nb, "neighbor_id")
        .groupBy("vec_id")
        .agg(
            F.coalesce(
                F.min(F.when(F.col("q_label") == F.col("n_label"), F.col("rank"))),
                F.lit(MISS_SENTINEL),
            ).alias("first_hit")
        )
    )
    ks = spark.range(1, TOP_K + 1).select(F.col("id").cast("int").alias("k"))
    return (
        hits.crossJoin(ks)
        .groupBy("k")
        .agg(
            F.round(
                F.avg(F.when(F.col("first_hit") <= F.col("k"), 1.0).otherwise(0.0)),
                6,
            ).alias("recall_at_k"),
            F.count("*").alias("n_queries"),
        )
        .orderBy("k")
    )


KNN_LABEL_RECALL_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id, a.label AS q_label, b.label AS n_label,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v))
                       * sqrt(list_dot_product(b.v, b.v))) DESC,
                    b.vec_id) AS rank
  FROM e a, e b
  WHERE a.vec_id <> b.vec_id
),
hits AS (
  SELECT vec_id,
         coalesce(min(CASE WHEN q_label = n_label THEN rank END),
                  {MISS_SENTINEL}) AS first_hit
  FROM pairs WHERE rank <= {TOP_K}
  GROUP BY vec_id
)
SELECT CAST(k AS INT) AS k,
       round(avg(CASE WHEN first_hit <= k THEN 1.0 ELSE 0.0 END), 6)
         AS recall_at_k,
       count(*) AS n_queries
FROM hits, range(1, {TOP_K + 1}) r(k)
GROUP BY k
ORDER BY k
"""


_STOPS = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]
_LANG_REMAP = {"en": "eng", "de": "deu", "fr": "fra", "es": "spa"}


def content_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop stopword tokens per doc (P4 exclusion), drop docs emptied by the
    exclusion (size guard), remap lang codes with identity fallback (P5)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    content = F.filter(toks, lambda t: ~t.isin(_STOPS))
    remap = F.create_map(
        *[F.lit(x) for kv in _LANG_REMAP.items() for x in kv]
    )
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id",
            F.size(content).alias("n_content_tokens"),
            F.coalesce(
                F.element_at(remap, F.col("lang")), F.col("lang")
            ).alias("lang_norm"),
        )
        .filter(F.col("n_content_tokens") > 0)
        .orderBy("doc_id")
    )


_STOPS_SQL = "[" + ",".join(f"'{w}'" for w in _STOPS) + "]"
_REMAP_SQL = " ".join(
    f"WHEN lang = '{k}' THEN '{v}'" for k, v in _LANG_REMAP.items()
)

CONTENT_TOKENS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> NOT list_contains({_STOPS_SQL}, t)))
           AS n_content_tokens,
         CASE {_REMAP_SQL} ELSE lang END AS lang_norm
  FROM documents
  WHERE length(trim(text)) > 0
)
SELECT doc_id, n_content_tokens, lang_norm
FROM t WHERE n_content_tokens > 0
ORDER BY doc_id
"""


def props_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 json parse: extract props.k, aggregate per event_type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


PROPS_VALUE_STATS_SQL = """
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""
