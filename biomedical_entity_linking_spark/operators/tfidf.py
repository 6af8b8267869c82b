"""Char-3gram TF-IDF cosine top-k candidate generation (sparse ANN).

Reference semantics: the scispacy candidate generator embeds mention
text as a sparse char-3gram TF-IDF vector and returns the cosine top-k
aliases (``bioel/bioel/models/scispacy/candidate_generation.py:49``,
``:221-253`` — sklearn ``TfidfVectorizer(analyzer="char", ngram_range
=(3,3))`` + an approximate-NN index over the alias matrix). This module
is the Spark-first, oracle-exact form: the sparse dot product IS a
relational join — an inverted index on the gram key — so the "index"
Catalyst builds is the same structure nmslib's HNSW approximates, and
at test scale the result is EXACT top-k, certified by value hash
against DuckDB running the identical relational algebra.

Cross-engine exactness (why this query can be hash-gated at all):
floating-point sums are addition-order-dependent, and a groupBy sum's
order is nondeterministic — two engines summing ``tf·idf`` doubles
would disagree in the last ulp and could flip a top-k boundary. And
``idf = ln(N/df)`` itself is not portable: JVM ``Math.log`` and C libm
may differ by 1 ulp. So the idf weight is quantized to FIXED-POINT
INTEGERS with integer division only — ``idf_q = min((N*1000) div df,
100_000)`` (milli-idf, saturated at 100x rarity so ``w²`` sums stay
far inside int64 at any N) — and every sum (pair dot product, per-doc
norms) is integer arithmetic: exact, order-independent, identical in
both engines. The ONLY float ops are ``sqrt`` and one divide on
bit-identical integers, both IEEE-754 correctly rounded, so the cosine
doubles match bit-for-bit and ranks are deterministic (tie-break:
candidate id).

Scale shape (100 TB): the inverted-index join shuffles on the gram key;
posting-list length is the skew axis (stopword-ish grams like ``"the"``
have crawl-sized lists). The idf weight already nullifies their score
contribution, so the production lever is to drop grams with
``df > cap`` from the INDEX side while keeping them in the norms
(standard df-capped retrieval — changes candidate ENUMERATION only for
pairs whose every shared gram is a stopword, which idf scores ~0
anyway) — same df-cap pattern as ``dedup.ngram_jaccard_neardup``
(MAX_DF) — plus salting for any surviving hot key
(``functions/salting.py``). At test scale the query is exact
(no cap) so the oracle certifies the uncapped semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_TITLE_TOKENS = 5  # same synthetic "title" as string_scores.pair_scores
_GRAM = 3
_TOPK = 5
_QUERY_MOD = 20  # every 20th doc is a query mention
_IDF_SCALE = 1000  # milli-idf fixed point
_IDF_CAP = 100_000  # saturate at 100x rarity: bounds w² ≤ (tf·1e5)²


def tfidf_cosine_topk(
    spark: SparkSession, sf_dir: str, df_cap: int | None = None
) -> DataFrame:
    """documents → char-3gram tf-idf(quantized) cosine top-5 per query.

    - titles: first 5 whitespace tokens of ``text``;
    - corpus: every title; queries: ``doc_id % 20 == 0``;
    - grams: all char-3gram OCCURRENCES (multiset — tf matters);
    - weights: ``w = tf · idf_q`` (integer, see module docstring);
    - cosine: inverted-index join on gram, integer dot / (√·√);
    - top-5 per query by (cos desc, cand_id asc), self excluded.

    ``df_cap`` is the documented production lever (module docstring):
    grams with ``df > df_cap`` are dropped from the INDEX join — norms
    keep them, so a scored pair loses only the capped grams'
    near-zero-idf dot-product contribution, and pairs sharing ONLY
    capped grams are not enumerated. None (the driver/oracle default)
    = exact, uncapped. ``tests/test_tfidf_cap.py`` pins cap ≥ max df ≡
    uncapped and the subset property of tighter caps.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    titles = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.slice(F.split(F.col("text"), " "), 1, _TITLE_TOKENS)
        ).alias("title"),
    )
    # multiset gram relation: one row per occurrence position, then tf
    grams = titles.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(title) - {_GRAM - 1}),"
                f" i -> substring(title, i, {_GRAM}))"
            )
        ).alias("gram"),
    )
    # tf and w are each referenced by several downstream relations; without
    # materialization Catalyst re-derives them from the SCAN every time
    # (measured: 12 FileScans, zero ReusedExchange) — at 100 TB that is 12
    # corpus reads for one query. Persisting the two shared sparse-matrix
    # relations is the standard explicit materialization every sparse
    # retrieval system performs (build the index once, then probe it).
    # Sandbox cost of the barrier: warm same-session A/B at sf0.1 read
    # 5.6 s persisted vs 4.4 s re-scanning — ~1 s for 12x fewer scans,
    # a trade that inverts violently the moment the scan isn't ~MBs.
    tf = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    # corpus size as a 1-row broadcast relation — no driver collect
    n_rel = titles.agg(F.count("*").alias("n_docs"))
    df_rel = tf.groupBy("gram").agg(
        F.count("*").alias("df")  # tf rows are distinct per (doc, gram)
    )
    idf = df_rel.join(F.broadcast(n_rel)).select(
        "gram",
        F.least(
            F.expr(f"(n_docs * {_IDF_SCALE}) div df"), F.lit(_IDF_CAP)
        ).alias("idf_q"),
    )
    w = (
        tf.join(idf, "gram")
        .select("doc_id", "gram", (F.col("tf") * F.col("idf_q")).alias("w"))
        .persist()
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    # index side: optionally df-capped (norms above are NOT capped —
    # the cap prunes candidate enumeration only, never scored cosines)
    wi = w
    if df_cap is not None:
        keep = df_rel.filter(F.col("df") <= df_cap).select("gram")
        wi = w.join(keep, "gram")
    q = (
        wi.filter(F.col("doc_id") % _QUERY_MOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            "gram",
            F.col("w").alias("wq"),
        )
    )
    c = wi.select(
        F.col("doc_id").alias("cand_id"), "gram", F.col("w").alias("wc")
    )
    num = (
        q.join(c, "gram")
        .filter(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum(F.col("wq") * F.col("wc")).alias("num"))
    )
    nq = norms.select(
        F.col("doc_id").alias("query_id"), F.col("norm2").alias("nq2")
    )
    nc = norms.select(
        F.col("doc_id").alias("cand_id"), F.col("norm2").alias("nc2")
    )
    cos = (
        num.join(nq, "query_id")
        .join(nc, "cand_id")
        .select(
            "query_id",
            "cand_id",
            (
                F.col("num").cast("double")
                / (
                    F.sqrt(F.col("nq2").cast("double"))
                    * F.sqrt(F.col("nc2").cast("double"))
                )
            ).alias("cos"),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        cos.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= _TOPK)
        .select(
            "query_id",
            "cand_id",
            "rank",
            F.round(F.col("cos"), 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


TFIDF_COSINE_TOPK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         array_to_string(string_split(text, ' ')[1:{_TITLE_TOKENS}], ' ')
           AS title
  FROM documents
),
grams AS (
  SELECT doc_id, substr(title, CAST(i AS INTEGER), {_GRAM}) AS gram
  FROM t, UNNEST(generate_series(1, length(title) - {_GRAM - 1})) AS g(i)
),
tf AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS tf
  FROM grams GROUP BY doc_id, gram
),
n_rel AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
idf AS (
  SELECT gram,
         least((n_docs * {_IDF_SCALE}) // df, {_IDF_CAP}) AS idf_q
  FROM (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY gram),
       n_rel
),
w AS (
  SELECT tf.doc_id, tf.gram, tf.tf * idf.idf_q AS w
  FROM tf JOIN idf USING (gram)
),
norms AS (
  SELECT doc_id, sum(w * w) AS norm2 FROM w GROUP BY doc_id
),
num AS (
  SELECT q.doc_id AS query_id, c.doc_id AS cand_id, sum(q.w * c.w) AS num
  FROM w q JOIN w c ON q.gram = c.gram AND q.doc_id != c.doc_id
  WHERE q.doc_id % {_QUERY_MOD} = 0
  GROUP BY q.doc_id, c.doc_id
),
cos AS (
  SELECT query_id, cand_id,
         CAST(num AS DOUBLE)
           / (sqrt(CAST(nq.norm2 AS DOUBLE)) * sqrt(CAST(nc.norm2 AS DOUBLE)))
           AS cos
  FROM num
  JOIN norms nq ON nq.doc_id = num.query_id
  JOIN norms nc ON nc.doc_id = num.cand_id
),
ranked AS (
  SELECT query_id, cand_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, cand_id ASC) AS rank
  FROM cos
)
SELECT query_id, cand_id, rank, round(cos, 6) AS cos_sim
FROM ranked
WHERE rank <= {_TOPK}
ORDER BY query_id, rank
"""
