"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Reference semantics: the k-NN joins at the heart of candidate generation —
FAISS flat / IVF inner-product search (``arboel/biencoder/data/
data_process.py:517-562``, ``eval_cluster_linking.py:56-87``), brute-force
matmul top-k (``sapbert/model/model_wrapper.py:72-133``), and the
size-based exact-vs-IVF strategy switch (≤10k rows → flat, else IVF).

Two paths, mirroring that switch:

* ``cosine_topk`` — brute-force baseline: the dictionary side is collected
  and broadcast (it's the small side — same role as a broadcast hash join
  build side), each partition matmuls its query batch against it in one
  numpy call inside ``mapInPandas``. Correct at any k; O(n·m) — the
  reference's own ≤10k regime.
* ``ivf_topk`` — scale path: a deterministic coarse quantizer (sign bits of
  the first 3 coordinates → 8 buckets) partitions the space; search is a
  bucket-equi-join + window top-k. Pure Catalyst — the shuffle key IS the
  IVF cell, which is exactly how a 1000-executor deployment shards ANN.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 3


def cosine_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for every vector (excluding itself).

    Output: (vec_id, neighbor_id, rank) — scores deliberately omitted so
    the DuckDB oracle comparison is float-representation-proof; ordering is
    (cosine desc, neighbor_id asc), computed in float64 on both sides.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_unit = spark.sparkContext.broadcast(unit)

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dict_ids = b_ids.value
        dict_unit = b_unit.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = np.linalg.norm(q, axis=1)
            qn[qn == 0] = 1.0
            sims = (q / qn[:, None]) @ dict_unit.T  # (batch, n_dict)
            out_rows = []
            for row_i, vid in enumerate(pdf["vec_id"]):
                s = sims[row_i]
                # order: cosine desc, neighbor_id asc, self excluded
                order = np.lexsort((dict_ids, -s))
                picked = 0
                for j in order:
                    if dict_ids[j] == vid:
                        continue
                    picked += 1
                    out_rows.append((int(vid), int(dict_ids[j]), picked))
                    if picked == k:
                        break
            yield pd.DataFrame(out_rows, columns=["vec_id", "neighbor_id", "rank"])

    result = emb.select("vec_id", "embedding").mapInPandas(
        search, "vec_id long, neighbor_id long, rank int"
    )
    return result.orderBy("vec_id", "rank")


COSINE_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
           AS cos
  FROM e a, e b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id)
           AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
"""


IVF_NPROBE_BITS = 3  # 2^3 = 8 coarse cells


def ivf_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """IVF-lite ANN: coarse cell = sign bits of coordinates 0..2; exact
    cosine re-score within the cell; window top-k. One equi-join shuffle on
    the cell id — the distributed analog of FAISS ``nprobe=1`` IVF search.

    Pure Catalyst: cosine via zip_with + aggregate higher-order functions.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.col("embedding").cast("array<double>")
    cell = (
        F.when(F.element_at(v, 1) > 0, 4).otherwise(0)
        + F.when(F.element_at(v, 2) > 0, 2).otherwise(0)
        + F.when(F.element_at(v, 3) > 0, 1).otherwise(0)
    )
    e = emb.select("vec_id", v.alias("v"), cell.alias("cell"))

    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(
            F.transform(F.col(f"{side}.v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        e.alias("a")
        .join(e.alias("b"), "cell")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            (dot / (norm("a") * norm("b"))).alias("cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
        .orderBy("vec_id", "rank")
    )


IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS cell
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
           AS cos
  FROM e a JOIN e b USING (cell)
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id)
           AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
"""
