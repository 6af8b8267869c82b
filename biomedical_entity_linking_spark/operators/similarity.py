"""Approximate-nearest-neighbor search over the ``embeddings`` table.

Reference semantics: the k-NN joins at the heart of candidate generation —
FAISS flat / IVF inner-product search (``arboel/biencoder/data/
data_process.py:517-562``, ``eval_cluster_linking.py:56-87``), brute-force
matmul top-k (``sapbert/model/model_wrapper.py:72-133``), and the
size-based exact-vs-IVF strategy switch (≤10k rows → flat, else IVF,
``data_process.py:545-562``).

Two paths, mirroring that switch:

* ``cosine_topk`` — brute-force baseline for small dictionaries: the
  dictionary side is collected and broadcast (same role as a broadcast hash
  join build side), each partition matmuls its query batch against it in
  one numpy call inside ``mapInPandas``. Guarded by the G8 switch: above
  ``BRUTE_FORCE_MAX`` rows it routes to ``ivf_topk`` instead of collecting
  — the driver-OOM path is unreachable.
* ``ivf_topk`` — scale path: a deterministic coarse quantizer (the first
  8 sign bits of the vector, right-shifted to ``bits ≈ log2(√n)`` effective
  bits → ~√n cells) shards the space; queries multi-probe their home cell
  plus three Hamming-1 neighbors; scoring is a vectorized numpy matmul per
  cell in a ``cogroup().applyInPandas`` kernel (the shuffle key IS the IVF
  cell — exactly how a 1000-executor deployment shards ANN), then a global
  window top-k merges the per-cell candidates. Candidate pairs never
  materialize as rows; join parallelism = 2^bits grows with n.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 3
# G8 switch point (reference uses 10k: data_process.py:545-562)
BRUTE_FORCE_MAX = 10_000
_MAX_CELL_BITS = 8
# multi-probe: home cell + three Hamming-1 flips (static so the SQL oracle
# can enumerate them; distinct cells whenever bits >= 3)
_PROBE_FLIPS = (0, 1, 2, 4)


def _ivf_bits(n: int) -> int:
    """Effective quantizer bits: 2^bits ≈ √n cells, clamped to [3, 8].

    Mirrors the reference's ``nlist=√n`` IVF sizing (data_process.py:552).
    floor(x+0.5) rounding matches the SQL oracle exactly (Python ``round``
    is banker's; DuckDB's is not)."""
    return min(
        _MAX_CELL_BITS,
        max(3, int(math.floor(math.log2(math.sqrt(max(n, 2))) + 0.5))),
    )


def _cell8_expr(v):
    """First 8 sign bits of the vector as an int code (fixed-width so the
    effective cell is one right shift — keeps the oracle SQL static)."""
    return sum(
        F.when(F.element_at(v, i + 1) > 0, F.lit(1 << (7 - i))).otherwise(F.lit(0))
        for i in range(_MAX_CELL_BITS)
    ).cast("int")


def cosine_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Top-k cosine neighbors for every vector (excluding itself).

    Output: (vec_id, neighbor_id, rank) — scores deliberately omitted so
    the DuckDB oracle comparison is float-representation-proof; ordering is
    (cosine desc, neighbor_id asc), computed in float64 on both sides.

    G8 size switch: dictionaries over ``BRUTE_FORCE_MAX`` rows route to the
    IVF path instead of the driver collect (reference:
    ``data_process.py:545-562`` — IndexFlatIP ≤10k else IndexIVFFlat).
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()  # parquet metadata count — no full scan
    if n > BRUTE_FORCE_MAX:
        return ivf_topk(spark, sf_dir, k)

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


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOP_K,
    bits: int | None = None,
) -> DataFrame:
    """IVF ANN: ~√n coarse cells from vector sign bits, Hamming-1
    multi-probe, exact cosine within probed cells via a vectorized numpy
    matmul per cell (cogroup/applyInPandas), global window top-k merge.

    The per-cell kernel emits at most k candidates per (query, cell), so
    the merge input is ≤ len(_PROBE_FLIPS)·k rows per query — constant.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if bits is None:
        bits = _ivf_bits(emb.count())
    v = F.col("embedding").cast("array<double>")
    cell = F.shiftright(_cell8_expr(v), _MAX_CELL_BITS - bits)
    dict_side = emb.select("vec_id", v.alias("v"), cell.alias("cell"))
    probes = dict_side.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[F.col("cell").bitwiseXOR(F.lit(f)) for f in _PROBE_FLIPS]
            )
        ).alias("cell"),
    )

    def score_cell(qpdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or dpdf.empty:
            return pd.DataFrame(
                {"vec_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "cos": pd.Series(dtype="float64")}
            )
        q = np.array(list(qpdf["v"]), dtype=np.float64)
        d = np.array(list(dpdf["v"]), dtype=np.float64)
        qn = np.linalg.norm(q, axis=1); qn[qn == 0] = 1.0
        dn = np.linalg.norm(d, axis=1); dn[dn == 0] = 1.0
        sims = (q / qn[:, None]) @ (d / dn[:, None]).T
        qids = qpdf["vec_id"].to_numpy()
        dids = dpdf["vec_id"].to_numpy()
        out = []
        for i, qid in enumerate(qids):
            s = sims[i]
            order = np.lexsort((dids, -s))  # cos desc, neighbor_id asc
            picked = 0
            for j in order:
                if dids[j] == qid:
                    continue
                out.append((int(qid), int(dids[j]), float(s[j])))
                picked += 1
                if picked == k:
                    break
        return pd.DataFrame(out, columns=["vec_id", "neighbor_id", "cos"])

    cand = (
        probes.groupBy("cell")
        .cogroup(dict_side.groupBy("cell"))
        .applyInPandas(score_cell, "vec_id long, neighbor_id long, cos double")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
        .orderBy("vec_id", "rank")
    )


def proto_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """G11 prototype-vector two-score-sum: each dictionary entry carries a
    name vector AND a prototype vector; a query's score against an entry is
    the SUM of its cosine to both (the reference doubles the query ``[v;v]``
    against a ``[umls_vec; proto_vec]`` concat space —
    ``krissbert/model/model.py:173-187``, ``krissbert/evaluate.py:186`` —
    which is exactly two score columns summed; no special geometry).

    The prototype here is the deterministic reverse of the embedding (the
    synthetic stand-in for a second learned vector); the broadcast matmul
    kernel computes both cosines in one pass.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def unit(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return m / n[:, None]

    b_ids = spark.sparkContext.broadcast(ids)
    b_name = spark.sparkContext.broadcast(unit(mat))
    b_proto = spark.sparkContext.broadcast(unit(mat[:, ::-1]))

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dict_ids = b_ids.value
        name_u = b_name.value
        proto_u = b_proto.value
        for pdf in batches:
            q = unit(np.array(list(pdf["embedding"]), dtype=np.float64))
            scores = q @ name_u.T + q @ proto_u.T  # two-score sum
            out_rows = []
            for row_i, vid in enumerate(pdf["vec_id"]):
                s = scores[row_i]
                order = np.lexsort((dict_ids, -s))
                picked = 0
                for j in order:
                    if dict_ids[j] == vid:
                        continue
                    picked += 1
                    out_rows.append((int(vid), int(dict_ids[j]), picked))
                    if picked == k:
                        break
            yield pd.DataFrame(
                out_rows, columns=["vec_id", "neighbor_id", "rank"]
            )

    return (
        emb.select("vec_id", "embedding")
        .mapInPandas(search, "vec_id long, neighbor_id long, rank int")
        .orderBy("vec_id", "rank")
    )


PROTO_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS v,
         CAST(list_reverse(CAST(embedding AS DOUBLE[])) AS DOUBLE[]) AS p
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
         + list_dot_product(a.v, b.p)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.p, b.p)))
           AS score
  FROM e a, e b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, neighbor_id)
           AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
ORDER BY vec_id, rank
"""


_CELL8_SQL = " + ".join(
    f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << (7 - i)} ELSE 0 END)"
    for i in range(_MAX_CELL_BITS)
)
_FLIPS_SQL = ", ".join(f"({f})" for f in _PROBE_FLIPS)

IVF_TOPK_SQL = f"""
WITH params AS (
  SELECT least(greatest(CAST(floor(log2(sqrt(count(*))) + 0.5) AS INT), 3), 8)
           AS bits
  FROM embeddings
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         ({_CELL8_SQL}) AS cell8
  FROM embeddings
),
ec AS (
  SELECT vec_id, v, cell8 >> ({_MAX_CELL_BITS} - bits) AS cell
  FROM e, params
),
probes AS (
  SELECT vec_id, v, xor(cell, f.flip) AS cell
  FROM ec, (VALUES {_FLIPS_SQL}) f(flip)
),
pairs AS (
  SELECT q.vec_id AS vec_id, d.vec_id AS neighbor_id,
         list_dot_product(q.v, d.v)
           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(d.v, d.v)))
           AS cos
  FROM probes q JOIN ec d USING (cell)
  WHERE q.vec_id <> d.vec_id
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
