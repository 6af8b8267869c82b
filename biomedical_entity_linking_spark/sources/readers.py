"""Source readers mirroring the reference's scan inventory (SURVEY §2.1).

Every loader in the reference is a pandas/obonet/json reader; here each is a
declarative ``spark.read`` with explicit schema and Catalyst-prunable
projections:

* ``read_rrf``       — S2/S3/S4/S5: pipe-delimited UMLS RRF files
  (``bioel/bioel/utils/umls_utils.py:96-157``: 19 declared columns,
  ``usecols`` projection, trailing ``|`` per line).
* ``read_tsv_commented`` — S7/S8: comment-aware TSV with fixed column
  names (``bioel/bioel/ontology.py:185-205,252-279``).
* ``read_alias_dict``    — S10: ``CUI||alias`` text format → (cui, alias)
  (``bioel/bioel/models/sapbert/data/utils.py:76-98``).
* ``read_jsonl_ontology`` — S9: line-JSON entities
  (``bioel/bioel/ontology.py:595-598``).
* ``write_text_blocks``  — S19: ``id | text`` interchange blocks for
  external tools (``abbreviations_utils.py:9-73``).

Plus the derived relations the reference builds from them:

* ``alias_inverted_index`` — alias → set(cui)
  (``scispacy_embeddings.py:48-66``, A2 ``ontology.py:356-369``).
* ``exact_name_lut_join``  — J6: unique-name forced rank-0 candidate
  (``bioel/bioel/models/krissbert/evaluate.py:72-100``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_rrf(
    spark: SparkSession,
    path: str,
    columns: list[str],
    usecols: list[str] | None = None,
) -> DataFrame:
    """Pipe-delimited RRF: no header, trailing '|' yields one empty extra
    field (dropped). ``usecols`` projects early — Catalyst prunes the rest
    from the scan."""
    schema = StructType([StructField(c, StringType()) for c in columns] +
                        [StructField("_trailing", StringType())])
    df = spark.read.csv(path, sep="|", header=False, schema=schema).drop("_trailing")
    return df.select(*usecols) if usecols else df


def read_tsv_commented(
    spark: SparkSession, path: str, columns: list[str], comment: str = "#"
) -> DataFrame:
    """TSV with comment lines and fixed column names (MEDIC/Entrez style)."""
    schema = StructType([StructField(c, StringType()) for c in columns])
    return spark.read.csv(
        path, sep="\t", header=False, schema=schema, comment=comment
    )


def read_alias_dict(spark: SparkSession, path: str) -> DataFrame:
    """``CUI||alias`` lines → (cui, alias), lowercased alias (the reference
    lowercases at load, ``sapbert/data/utils.py:88``)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), r"\|\|", 2)
    return lines.select(
        F.trim(parts.getItem(0)).alias("cui"),
        F.lower(F.trim(parts.getItem(1))).alias("alias"),
    ).filter(F.col("alias").isNotNull() & (F.length("alias") > 0))


from pyspark.sql.types import ArrayType

ENTITY_SCHEMA = StructType(
    [
        StructField("cui", StringType()),
        StructField("name", StringType()),
        StructField("types", ArrayType(StringType())),
        StructField("aliases", ArrayType(StringType())),
        StructField("definition", StringType()),
        StructField("equivalent_cuis", ArrayType(StringType())),
    ]
)


def read_jsonl_ontology(spark: SparkSession, path: str) -> DataFrame:
    """Line-JSON entity dictionary with the §1.3 schema. Alias fields that
    arrive as ';'/'|'-joined strings are re-split defensively, mirroring the
    reference's consumer-side fixup (``scispacy_embeddings.py:52-61``)."""
    raw = spark.read.json(path)
    cols = {f.name for f in raw.schema.fields}
    df = raw
    if "aliases" in cols and not str(raw.schema["aliases"].dataType).startswith("Array"):
        df = df.withColumn("aliases", F.split(F.col("aliases"), r"[;|]"))
    for c, t in [
        ("types", "array<string>"),
        ("aliases", "array<string>"),
        ("equivalent_cuis", "array<string>"),
    ]:
        if c not in cols:
            df = df.withColumn(c, F.lit(None).cast(t))
    for c in ["name", "definition"]:
        if c not in cols:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df.select("cui", "name", "types", "aliases", "definition", "equivalent_cuis")


def alias_inverted_index(entities: DataFrame) -> DataFrame:
    """alias → collect_set(cui): the reference's alias→CUIs dictionary
    (1:N canonicalization input for J5)."""
    return (
        entities.select(
            "cui",
            F.explode(
                F.array_union(
                    F.coalesce(F.col("aliases"), F.array()),
                    F.array(F.col("name")),
                )
            ).alias("alias"),
        )
        .withColumn("alias", F.lower(F.trim("alias")))
        .filter(F.length("alias") > 0)
        .groupBy("alias")
        .agg(F.collect_set("cui").alias("cuis"))
    )


def exact_name_lut_join(mentions: DataFrame, alias_index: DataFrame) -> DataFrame:
    """J6: left-join mention text against the alias LUT; when exactly one
    CUI matches, it is forced to rank 0 (prepended to candidates)."""
    joined = mentions.join(
        alias_index.select(F.col("alias").alias("_m"), "cuis"),
        F.lower(F.col("text")) == F.col("_m"),
        "left",
    ).drop("_m")
    forced = F.when(
        F.size(F.coalesce(F.col("cuis"), F.array())) == 1,
        F.concat(F.col("cuis"), F.coalesce(F.col("candidates"), F.array())),
    ).otherwise(F.coalesce(F.col("candidates"), F.array()))
    return joined.withColumn("candidates", F.array_distinct(forced)).drop("cuis")


def write_text_blocks(df: DataFrame, path: str, id_col: str, text_col: str) -> None:
    """S19 interchange sink: ``id | text`` lines, newlines stripped from the
    text (the Ab3P input contract)."""
    df.select(
        F.concat_ws(
            " | ",
            F.col(id_col).cast("string"),
            F.regexp_replace(F.col(text_col), r"[\r\n]+", " "),
        ).alias("value")
    ).write.mode("overwrite").text(path)
