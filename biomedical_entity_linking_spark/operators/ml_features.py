"""Candidate-pair feature vectorization — the ML training-data export.

Every learned entity matcher (the Magellan / py_entitymatching feature
table; Splink's comparison vectors; the reference's own crossencoder
training pairs, ``bioel/bioel/models/``) consumes the same relation:
one row per BLOCKED candidate pair, one column per similarity feature.
The reference builds these rows in per-example Python inside its torch
DataLoaders; at 10^12 documents the feature table itself is the
expensive artifact, so here it is a first-class Catalyst relation:

* blocking: the same 24-char normalized-prefix key the Fellegi–Sunter
  linker blocks on (``fellegi_sunter.BLOCK_LEN`` — the skew-measured
  key from ``incremental.py``), so this operator IS the feature stage
  a learned scorer would drop into that pipeline;
* features, all INTEGER (cross-engine hashable — no float kernels to
  certify): exact 96-char-normalized-text equality, language/source
  agreement flags, built-in JVM ``levenshtein`` over 32-char prefixes
  (bit-identical across Spark and DuckDB, certified by
  ``incremental_linkage``), distinct-token intersection/union counts
  with Jaccard in ppm by non-negative integer division, and absolute
  length difference.

Scale shape (100 TB): ONE blocked self-join (the same data-scale work
as ``fs_pair_posteriors`` — hot keys take the documented salting
hatch), every feature a per-row JVM expression on the joined pair; no
aggregation, no second pass, no Python. Downstream: feed the labeled
subset to any trainer; score the rest with ``fellegi_sunter`` or a
broadcast model.

Reference analog: ``bioel`` builds pair features inside torch collate
fns (excluded training stack, SURVEY §7); this is the corpus-scale
relational equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators.fellegi_sunter import (
    BLOCK_LEN,
    NORM_LEN,
)

LEV_LEN = 32  # levenshtein feature over this prefix — bounded per-row cost
_PPM = 1_000_000


def pair_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one row per blocked candidate pair with the integer
    feature vector a learned matcher trains on."""
    return pair_features_over(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def pair_features_over(raw_docs: DataFrame) -> DataFrame:
    """Generic core over ANY (doc_id, text, lang, source, n_chars)
    relation."""
    docs = raw_docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.lower(F.substring("text", 1, NORM_LEN)).alias("norm"),
    )
    sides = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "norm",
        F.substring("norm", 1, BLOCK_LEN).alias("bk"),
        F.substring("norm", 1, LEV_LEN).alias("lev_key"),
        F.array_distinct(F.split("norm", " ")).alias("toks"),
    )
    a = sides.select(*[F.col(c).alias(f"{c}_a") for c in sides.columns])
    b = sides.select(*[F.col(c).alias(f"{c}_b") for c in sides.columns])
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    uni = F.size("toks_a") + F.size("toks_b") - inter
    return (
        a.join(b, F.col("bk_a") == F.col("bk_b"))
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select(
            F.col("doc_id_a").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            (F.col("norm_a") == F.col("norm_b")).cast("int").alias("f_exact"),
            (F.col("lang_a") == F.col("lang_b")).cast("int").alias("f_lang"),
            (F.col("source_a") == F.col("source_b"))
            .cast("int")
            .alias("f_source"),
            F.levenshtein("lev_key_a", "lev_key_b").alias("f_lev32"),
            inter.alias("f_tok_inter"),
            uni.alias("f_tok_union"),
            # non-negative integer div — truncation identical on both
            # engines (the repo-wide divide-of-negatives rule)
            (inter.cast("bigint") * _PPM)
            .alias("_num"),
            F.abs(F.col("n_chars_a") - F.col("n_chars_b")).alias(
                "f_len_diff"
            ),
        )
        .withColumn("f_jaccard_ppm", F.expr("_num div f_tok_union"))
        .select(
            "id_a",
            "id_b",
            "f_exact",
            "f_lang",
            "f_source",
            "f_lev32",
            "f_tok_inter",
            "f_tok_union",
            "f_jaccard_ppm",
            "f_len_diff",
        )
        .orderBy("id_a", "id_b")
    )


PAIR_FEATURES_SQL = f"""
WITH sides AS (
  SELECT doc_id, lang, source, n_chars,
         lower(substr(text, 1, {NORM_LEN})) AS norm,
         substr(lower(substr(text, 1, {NORM_LEN})), 1, {BLOCK_LEN}) AS bk,
         substr(lower(substr(text, 1, {NORM_LEN})), 1, {LEV_LEN}) AS lev_key,
         list_distinct(string_split(lower(substr(text, 1, {NORM_LEN})), ' '))
           AS toks
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(a.norm = b.norm AS INT) AS f_exact,
       CAST(a.lang = b.lang AS INT) AS f_lang,
       CAST(a.source = b.source AS INT) AS f_source,
       CAST(levenshtein(a.lev_key, b.lev_key) AS INT) AS f_lev32,
       CAST(len(list_intersect(a.toks, b.toks)) AS INT) AS f_tok_inter,
       CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
            AS INT) AS f_tok_union,
       CAST((len(list_intersect(a.toks, b.toks)) * {_PPM})
            // (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            AS BIGINT) AS f_jaccard_ppm,
       CAST(abs(a.n_chars - b.n_chars) AS BIGINT) AS f_len_diff
FROM sides a
JOIN sides b ON a.bk = b.bk AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
"""
