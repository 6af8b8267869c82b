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


MRRANK_COLUMNS = ["rank", "sab", "tty", "suppress"]


def read_mrrank(spark: SparkSession, path: str) -> DataFrame:
    """S3: MRRANK scan + the reference's rank inversion ``rank = -rank + 850``
    (``bioel/bioel/utils/umls_utils.py:160-166``) so lower = better for the
    downstream rank-argmin canonical-name pick (A3)."""
    df = read_rrf(spark, path, MRRANK_COLUMNS)
    return df.withColumn(
        "rank", (-F.col("rank").cast("int") + 850).alias("rank")
    )


MRDEF_COLUMNS = ["cui", "aui", "atui", "satui", "sab", "def_", "suppress", "cvf"]


def attach_definitions(conso: DataFrame, mrdef: DataFrame) -> DataFrame:
    """S4/J2: left-join MRDEF definitions on (cui, aui, sab)
    (``bioel/bioel/utils/umls_utils.py:70-81``)."""
    defs = mrdef.select("cui", "aui", "sab", F.col("def_").alias("definition"))
    return conso.join(defs, ["cui", "aui", "sab"], "left")


MRSTY_COLUMNS = ["cui", "tui", "stn", "sty", "atui", "cvf"]


def read_mrsty(spark: SparkSession, path: str) -> DataFrame:
    """S5: MRSTY scan projected to (cui, tui)
    (``bioel/bioel/utils/umls_utils.py:393-400``: usecols=[0,1])."""
    return read_rrf(spark, path, MRSTY_COLUMNS, usecols=["cui", "tui"])


def read_semgroups(spark: SparkSession, path: str) -> DataFrame:
    """S5: SemGroups.txt scan projected to (tui, sem_group)
    (``umls_utils.py:422-431``: usecols=[0,2] of group|name|tui|...)."""
    cols = ["sem_group", "group_name", "tui", "type_name"]
    df = read_rrf(spark, path, cols)
    return df.select("tui", "sem_group")


def cui_types_groups(mrsty: DataFrame, semgroups: DataFrame) -> DataFrame:
    """A5: cui → (types list, distinct groups list)
    (``umls_utils.py:405-415``: grouped tui→list, group→list(set)).
    SemGroups is tiny → broadcast; groups sorted for determinism (the
    reference's set() has no order)."""
    joined = mrsty.join(F.broadcast(semgroups), "tui", "left")
    return (
        joined.groupBy("cui")
        .agg(
            F.array_sort(F.collect_list("tui")).alias("tuis"),
            F.array_sort(F.collect_set("sem_group")).alias("sem_groups"),
        )
    )


def cross_reference_map(
    df: DataFrame, cui_col: str = "cui", source_col: str = "sdui"
) -> tuple[DataFrame, DataFrame]:
    """J3: reversible UMLS-cui ↔ source-vocabulary-id mapping
    (``bioel/bioel/utils/umls_utils.py:344-378``): distinct pairs grouped
    in both directions (a source id can map to several CUIs and vice
    versa — the reference returns dicts of lists)."""
    pairs = (
        df.select(cui_col, source_col)
        .filter(F.col(source_col).isNotNull() & F.col(cui_col).isNotNull())
        .dropDuplicates([cui_col, source_col])
    )
    fwd = pairs.groupBy(cui_col).agg(
        F.array_sort(F.collect_set(source_col)).alias("source_ids")
    )
    rev = pairs.groupBy(source_col).agg(
        F.array_sort(F.collect_set(cui_col)).alias("cuis")
    )
    return fwd, rev


def filter_confident(
    df: DataFrame, conf_col: str = "confidence", min_conf: float = 0.95
) -> DataFrame:
    """P13: keep rows with confidence strictly above the cutoff (the Ab3P
    abbreviation filter, ``abbreviations_utils.py:88-111``)."""
    return df.filter(F.col(conf_col).cast("double") > min_conf)


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


def load_mesh_via_umls(
    conso: DataFrame,
    mrrank: DataFrame,
    mrdef: DataFrame,
    mrsty: DataFrame,
    semgroups: DataFrame,
    ontology: str = "MSH",
    prefix: str = "MESH",
) -> DataFrame:
    """S2-S5 composition: the reference's ``UmlsMappings`` → ``load_mesh``
    flow (``bioel/bioel/ontology.py:501-581`` over
    ``bioel/bioel/utils/umls_utils.py:96-181,183-236,238-295,297-…``) as
    one declarative plan producing ENTITY_SCHEMA rows:

    * MRCONSO ⋈ MRRANK on (sab, tty) — ``umls_utils.py:168-169`` (the
      ``-rank+850`` inversion lives in ``read_mrrank``);
    * ``lang == ENG`` + single-ontology filter
      (``filter_ontologies_and_types``, ``umls_utils.py:506-513``);
    * identifier = ``prefix:sdui`` (``mapping_cols={'MSH': 'sdui'}``,
      ``prefixes={'MSH': 'MESH'}`` — ``ontology.py:521-524``);
    * canonical name & definition = rank-argmin per identifier
      (``groupby().rank.idxmin()``, ``umls_utils.py:231-235``; ties break
      on the value string here — the reference's idxmin takes pandas input
      order, declared divergence);
    * aliases = distinct aliases minus the canonical name
      (``ontology.py:560``), sorted for determinism;
    * types = the entity's first semantic group
      (``mesh_to_groups[cui][0]``, ``ontology.py:555``; groups sorted);
    * duplicate identifiers: the whole flow is keyed aggregation, so the
      reference's duplicate-CUI warn+skip (``ontology.py:575-577``) is
      structural.

    ``conso`` columns: (cui, lat, sab, tty, sdui, aui, alias).
    """
    from pyspark.sql import Window as W

    base = (
        conso.join(mrrank.select("sab", "tty", "rank"), ["sab", "tty"])
        .filter(
            (F.col("sab") == ontology)
            & (F.col("lat") == "ENG")
            & F.col("sdui").isNotNull()
        )
        .withColumn("identifier", F.concat(F.lit(prefix + ":"), F.col("sdui")))
    )
    w = W.partitionBy("identifier").orderBy("rank", "alias")
    names = (
        base.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("identifier", F.col("alias").alias("name"))
    )
    aliases = base.groupBy("identifier").agg(
        F.array_sort(F.collect_set("alias")).alias("all_aliases")
    )
    with_defs = attach_definitions(
        base.select("cui", "aui", "sab", "identifier", "rank"), mrdef
    ).filter(F.col("definition").isNotNull())
    wd = W.partitionBy("identifier").orderBy("rank", "definition")
    defs = (
        with_defs.withColumn("_r", F.row_number().over(wd))
        .filter(F.col("_r") == 1)
        .select("identifier", "definition")
    )
    groups = cui_types_groups(mrsty, semgroups)
    id_cui = base.select("identifier", "cui").dropDuplicates(["identifier", "cui"])
    types = (
        id_cui.join(groups, "cui")
        .groupBy("identifier")
        .agg(F.array_sort(F.flatten(F.collect_set("sem_groups"))).alias("gs"))
        .select(
            "identifier",
            F.slice(F.col("gs"), 1, 1).alias("types"),
        )
    )
    return (
        names.join(aliases, "identifier")
        .join(defs, "identifier", "left")
        .join(types, "identifier", "left")
        .select(
            F.col("identifier").alias("cui"),
            "name",
            F.coalesce("types", F.array().cast("array<string>")).alias("types"),
            F.array_remove(F.col("all_aliases"), F.col("name")).alias("aliases"),
            "definition",
            F.lit(None).cast("array<string>").alias("equivalent_cuis"),
        )
    )


def read_obo(
    spark: SparkSession,
    path: str,
    prefix_to_keep: str | None = None,
    entity_type: str | None = None,
) -> DataFrame:
    """S6: OBO-format ontology → ENTITY_SCHEMA DataFrame.

    Reference: ``bioel/bioel/ontology.py:82-167`` (``obonet.read_obo`` +
    per-node extraction). Semantics preserved: name is the first synonym
    when the ``name`` tag is absent; ``alt_id`` (prefix-filtered) becomes
    ``equivalent_cuis``; entries with no name/aliases are skipped; obsolete
    terms are kept (obonet keeps them too); duplicate CUIs keep the first
    occurrence.

    Spark-first shape: the file is read whole (OBO ontologies are single
    small-GB files), ``[Term]`` stanzas explode into one row each, and all
    tag extraction is Catalyst ``regexp_extract(_all)`` — parallelism comes
    from the post-explode repartition, no Python parsing."""
    raw = spark.read.text(path, wholetext=True)
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # posexplode BEFORE the repartition: the stanza ordinal is the file
    # order, so the duplicate-CUI dedup below is deterministic and stable
    # under task retry (monotonically_increasing_id after a round-robin
    # repartition is neither)
    stanzas = (
        raw.select(
            F.posexplode(F.split(F.col("value"), r"\n\[")).alias(
                "stanza_ord", "block"
            )
        )
        .filter(F.col("block").startswith("Term]"))
        .repartition(n_parts)
    )
    b = F.col("block")
    cui = F.regexp_extract(b, r"(?m)^id: (.+?)\s*$", 1)
    name = F.regexp_extract(b, r"(?m)^name: (.+?)\s*$", 1)
    synonyms = F.regexp_extract_all(b, F.lit(r'(?m)^synonym: "([^"]*)"'), 1)
    alt_ids = F.regexp_extract_all(b, F.lit(r"(?m)^alt_id: (.+?)\s*$"), 1)
    definition = F.regexp_extract(b, r'(?m)^def: "([^"]*)"', 1)
    df = stanzas.select(
        F.col("stanza_ord"),
        cui.alias("cui"),
        F.when(F.length(name) > 0, name).alias("name_tag"),
        synonyms.alias("synonyms"),
        alt_ids.alias("alt_ids"),
        F.when(F.length(definition) > 0, definition).alias("definition"),
    )
    if prefix_to_keep is not None:
        df = df.filter(F.col("cui").startswith(prefix_to_keep))
        df = df.withColumn(
            "alt_ids",
            F.filter(F.col("alt_ids"), lambda x: x.startswith(prefix_to_keep)),
        )
    # name = name tag, else first synonym; aliases = the rest; skip empty
    all_syn = F.when(
        F.col("name_tag").isNotNull(),
        F.concat(F.array(F.col("name_tag")), F.col("synonyms")),
    ).otherwise(F.col("synonyms"))
    df = (
        df.withColumn("all_syn", all_syn)
        .filter(F.size("all_syn") > 0)
        .select(
            "stanza_ord",
            "cui",
            F.element_at("all_syn", 1).alias("name"),
            F.lit(
                [entity_type] if entity_type else []
            ).cast("array<string>").alias("types"),
            F.slice(
                "all_syn", 2, F.greatest(F.size("all_syn") - 1, F.lit(0))
            ).alias("aliases"),
            "definition",
            F.when(F.size("alt_ids") > 0, F.col("alt_ids")).alias(
                "equivalent_cuis"
            ),
        )
    )
    # duplicate CUIs: keep first occurrence IN FILE ORDER (reference warns
    # + skips; the stanza ordinal captured before the repartition is the
    # file order)
    from pyspark.sql import Window as W

    w = W.partitionBy("cui").orderBy("stanza_ord")
    return (
        df.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "stanza_ord")
    )


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
