"""Source readers vs the reference's scan semantics (SURVEY §2.1)."""

import json

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.sources.readers import (
    alias_inverted_index,
    exact_name_lut_join,
    read_alias_dict,
    read_jsonl_ontology,
    read_rrf,
    read_tsv_commented,
    write_text_blocks,
)


def test_read_rrf(spark, tmp_path):
    p = tmp_path / "MRCONSO.RRF"
    p.write_text("C001|ENG|P|name one|SAB1|\nC002|FRA|S|nom deux|SAB2|\n")
    cols = ["cui", "lat", "tty", "str", "sab"]
    df = read_rrf(spark, str(p), cols, usecols=["cui", "lat", "str"])
    assert df.columns == ["cui", "lat", "str"]
    rows = {r["cui"]: r for r in df.collect()}
    assert rows["C001"]["str"] == "name one"
    # language filter pushes to scan (P2 analog)
    assert df.filter(F.col("lat") == "ENG").count() == 1


def test_read_tsv_commented(spark, tmp_path):
    p = tmp_path / "medic.tsv"
    p.write_text("# header comment\nD001\tAspirin\tacid;ASA\nD002\tIbuprofen\t\n")
    df = read_tsv_commented(spark, str(p), ["id", "name", "synonyms"])
    assert df.count() == 2
    assert df.filter("id = 'D001'").collect()[0]["name"] == "Aspirin"


def test_read_alias_dict(spark, tmp_path):
    p = tmp_path / "aliases.txt"
    p.write_text("C001||Aspirin\nC001||ASA \nC002||Ibuprofen\n")
    df = read_alias_dict(spark, str(p))
    got = {(r["cui"], r["alias"]) for r in df.collect()}
    assert got == {("C001", "aspirin"), ("C001", "asa"), ("C002", "ibuprofen")}


def test_jsonl_ontology_and_alias_index(spark, tmp_path):
    p = tmp_path / "onto.jsonl"
    recs = [
        {"cui": "C1", "name": "Alpha", "aliases": ["alpha prime", "ALPHA"],
         "types": ["t1"], "definition": "d", "equivalent_cuis": []},
        {"cui": "C2", "name": "Beta", "aliases": ["alpha prime"],
         "types": ["t1"], "definition": None, "equivalent_cuis": ["C9"]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in recs))
    ents = read_jsonl_ontology(spark, str(p))
    assert ents.count() == 2
    idx = alias_inverted_index(ents)
    m = {r["alias"]: sorted(r["cuis"]) for r in idx.collect()}
    # shared alias maps to both CUIs (1:N expansion, J5 analog)
    assert m["alpha prime"] == ["C1", "C2"]
    assert m["alpha"] == ["C1"]
    assert m["beta"] == ["C2"]


def test_jsonl_ontology_string_aliases_resplit(spark, tmp_path):
    p = tmp_path / "onto2.jsonl"
    p.write_text(json.dumps({"cui": "C1", "name": "X", "aliases": "a;b|c"}))
    ents = read_jsonl_ontology(spark, str(p))
    assert ents.collect()[0]["aliases"] == ["a", "b", "c"]


def test_exact_name_lut_join(spark, tmp_path):
    ents = spark.createDataFrame(
        [("C1", "aspirin", None, ["asa"], None, None),
         ("C2", "shared", None, None, None, None),
         ("C3", "shared", None, None, None, None)],
        "cui string, name string, types array<string>, aliases array<string>,"
        " definition string, equivalent_cuis array<string>",
    )
    idx = alias_inverted_index(ents)
    mentions = spark.createDataFrame(
        [("m1", "ASA", ["C9"]), ("m2", "shared", ["C9"]), ("m3", "novel", ["C9"])],
        "mention_id string, text string, candidates array<string>",
    )
    out = {r["mention_id"]: r["candidates"] for r in
           exact_name_lut_join(mentions, idx).collect()}
    assert out["m1"] == ["C1", "C9"]   # unique LUT hit forced to rank 0
    assert out["m2"] == ["C9"]         # ambiguous (2 CUIs) → unchanged
    assert out["m3"] == ["C9"]         # no hit → unchanged


def test_write_text_blocks(spark, tmp_path):
    df = spark.createDataFrame([(1, "line one\nwrapped"), (2, "two")], ["id", "txt"])
    out = str(tmp_path / "blocks")
    write_text_blocks(df, out, "id", "txt")
    lines = sorted(r["value"] for r in spark.read.text(out).collect())
    assert lines == ["1 | line one wrapped", "2 | two"]


def test_read_mrrank_inversion(spark, tmp_path):
    """S3: rank = -rank + 850 (umls_utils.py:160-166)."""
    p = tmp_path / "MRRANK.RRF"
    p.write_text("800|MSH|MH|N|\n100|ICD|PT|N|\n")
    from biomedical_entity_linking_spark.sources.readers import read_mrrank

    rows = {r["sab"]: r["rank"] for r in read_mrrank(spark, str(p)).collect()}
    assert rows == {"MSH": 50, "ICD": 750}  # lower = better


def test_attach_definitions_left_join(spark):
    """S4/J2: MRDEF left join on (cui, aui, sab) (umls_utils.py:70-81)."""
    from biomedical_entity_linking_spark.sources.readers import (
        attach_definitions,
    )

    conso = spark.createDataFrame(
        [("C1", "A1", "MSH", "name1"), ("C2", "A2", "MSH", "name2")],
        "cui string, aui string, sab string, str string",
    )
    mrdef = spark.createDataFrame(
        [("C1", "A1", "x", "y", "MSH", "a def", "N", "")],
        "cui string, aui string, atui string, satui string, sab string,"
        " def_ string, suppress string, cvf string",
    )
    out = {r["cui"]: r["definition"] for r in attach_definitions(conso, mrdef).collect()}
    assert out == {"C1": "a def", "C2": None}


def test_cross_reference_map_reversible(spark):
    """J3: cui ↔ source id maps in both directions (umls_utils.py:344-378)."""
    from biomedical_entity_linking_spark.sources.readers import (
        cross_reference_map,
    )

    df = spark.createDataFrame(
        [("C1", "D1"), ("C1", "D2"), ("C2", "D2"), ("C1", "D1"), ("C3", None)],
        "cui string, sdui string",
    )
    fwd, rev = cross_reference_map(df)
    f = {r["cui"]: r["source_ids"] for r in fwd.collect()}
    r = {x["sdui"]: x["cuis"] for x in rev.collect()}
    assert f == {"C1": ["D1", "D2"], "C2": ["D2"]}
    assert r == {"D1": ["C1"], "D2": ["C1", "C2"]}


def test_filter_confident(spark):
    """P13: Ab3P confidence > 0.95 (abbreviations_utils.py:88-111)."""
    from biomedical_entity_linking_spark.sources.readers import (
        filter_confident,
    )

    df = spark.createDataFrame(
        [("a", 0.96), ("b", 0.95), ("c", 0.5)], "abbrev string, confidence double"
    )
    assert [r["abbrev"] for r in filter_confident(df).collect()] == ["a"]


def test_exclude_vertices_anti_join(spark):
    """P11: edges touching blocklisted vertices are dropped
    (special_partition.pyx:373-375)."""
    from biomedical_entity_linking_spark.operators.connected_components import (
        exclude_vertices,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "url_a string, url_b string",
    )
    bl = spark.createDataFrame([("b",)], "url string")
    kept = sorted(
        (r["url_a"], r["url_b"]) for r in exclude_vertices(edges, bl).collect()
    )
    assert kept == [("c", "d"), ("d", "e")]


def test_mrsty_semgroups_cui_types(spark, tmp_path):
    """S5/A5: MRSTY + SemGroups → cui→types/groups (umls_utils.py:387-431)."""
    from biomedical_entity_linking_spark.sources.readers import (
        cui_types_groups,
        read_mrsty,
        read_semgroups,
    )

    mrsty = tmp_path / "MRSTY.RRF"
    mrsty.write_text(
        "C1|T047|B2.2|Disease|AT1||\n"
        "C1|T191|B2.2|Neoplastic|AT2||\n"
        "C2|T047|B2.2|Disease|AT3||\n"
    )
    sg = tmp_path / "SemGroups.txt"
    sg.write_text(
        "DISO|Disorders|T047|Disease or Syndrome|\n"
        "DISO|Disorders|T191|Neoplastic Process|\n"
    )
    st = read_mrsty(spark, str(mrsty))
    assert st.columns == ["cui", "tui"]  # usecols projection
    out = {
        r["cui"]: (r["tuis"], r["sem_groups"])
        for r in cui_types_groups(st, read_semgroups(spark, str(sg))).collect()
    }
    assert out["C1"] == (["T047", "T191"], ["DISO"])  # groups deduped
    assert out["C2"] == (["T047"], ["DISO"])


def test_load_mesh_via_umls(spark):
    """ontology.py:501-581 composition: canonical name by rank-argmin,
    prefix:sdui identifiers, aliases minus name, first semantic group."""
    from biomedical_entity_linking_spark.sources.readers import (
        load_mesh_via_umls,
    )

    conso = spark.createDataFrame(
        [
            # identifier MESH:D001 — two TTYs with different ranks
            ("C1", "ENG", "MSH", "MH", "D001", "A1", "Aspirin"),
            ("C1", "ENG", "MSH", "SY", "D001", "A2", "acetylsalicylic acid"),
            ("C1", "FRA", "MSH", "MH", "D001", "A3", "aspirine"),  # non-ENG
            ("C1", "ENG", "OTHER", "MH", "D001", "A4", "other-vocab"),  # sab
            # identifier MESH:D002
            ("C2", "ENG", "MSH", "SY", "D002", "A5", "Widgetin"),
            # no sdui -> excluded
            ("C3", "ENG", "MSH", "MH", None, "A6", "nameless"),
        ],
        "cui string, lat string, sab string, tty string, sdui string, "
        "aui string, alias string",
    )
    # read_mrrank semantics: ALREADY inverted (-rank+850): lower = better
    mrrank = spark.createDataFrame(
        [(450, "MSH", "MH"), (650, "MSH", "SY"), (400, "OTHER", "MH")],
        "rank int, sab string, tty string",
    )
    mrdef = spark.createDataFrame(
        [("C1", "A2", "_", "_", "MSH", "A common NSAID.", "N", None)],
        "cui string, aui string, atui string, satui string, sab string, "
        "def_ string, suppress string, cvf string",
    )
    mrsty = spark.createDataFrame(
        [("C1", "T109"), ("C2", "T109")], "cui string, tui string"
    )
    semgroups = spark.createDataFrame(
        [("T109", "CHEM")], "tui string, sem_group string"
    ).select("tui", "sem_group")
    out = {
        r["cui"]: r
        for r in load_mesh_via_umls(conso, mrrank, mrdef, mrsty, semgroups).collect()
    }
    assert set(out) == {"MESH:D001", "MESH:D002"}
    d1 = out["MESH:D001"]
    assert d1["name"] == "Aspirin"  # MH outranks SY after inversion
    assert d1["aliases"] == ["acetylsalicylic acid"]  # name removed
    assert d1["definition"] == "A common NSAID."
    assert d1["types"] == ["CHEM"]
    d2 = out["MESH:D002"]
    assert d2["name"] == "Widgetin"
    assert d2["aliases"] == []
    assert d2["definition"] is None
