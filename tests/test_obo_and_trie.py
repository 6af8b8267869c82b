"""S6 OBO scan + F15 trie dictionary extraction (reference
``ontology.py:82-167`` and ``extract_pubmed_entities.py:41-103``)."""

import textwrap

from biomedical_entity_linking_spark.operators.dictionary_extract import (
    extract_dictionary_mentions,
)
from biomedical_entity_linking_spark.sources.readers import read_obo

OBO_FIXTURE = textwrap.dedent("""\
    format-version: 1.2
    ontology: tiny

    [Term]
    id: TT:0001
    name: widget
    def: "A basic widget." [TT:curators]
    synonym: "gadget" EXACT []
    synonym: "doohickey" RELATED []
    alt_id: TT:9001
    alt_id: XX:1111

    [Term]
    id: TT:0002
    synonym: "sprocket" EXACT []

    [Term]
    id: TT:0003

    [Term]
    id: XX:0004
    name: foreign

    [Typedef]
    id: part_of
    name: part of
""")


def _write_obo(tmp_path):
    p = tmp_path / "tiny.obo"
    p.write_text(OBO_FIXTURE)
    return str(p)


def test_read_obo_semantics(spark, tmp_path):
    ents = read_obo(spark, _write_obo(tmp_path)).orderBy("cui")
    rows = {r["cui"]: r for r in ents.collect()}
    # TT:0003 skipped (no name/aliases); [Typedef] stanza ignored
    assert set(rows) == {"TT:0001", "TT:0002", "XX:0004"}
    r1 = rows["TT:0001"]
    assert r1["name"] == "widget"
    assert r1["aliases"] == ["gadget", "doohickey"]
    assert r1["definition"] == "A basic widget."
    assert r1["equivalent_cuis"] == ["TT:9001", "XX:1111"]
    # name falls back to first synonym when the name tag is absent
    assert rows["TT:0002"]["name"] == "sprocket"
    assert rows["TT:0002"]["aliases"] == []


def test_read_obo_prefix_filter(spark, tmp_path):
    ents = read_obo(spark, _write_obo(tmp_path), prefix_to_keep="TT:")
    rows = {r["cui"]: r for r in ents.collect()}
    assert set(rows) == {"TT:0001", "TT:0002"}
    # alt_ids prefix-filtered too (ontology.py:124-128)
    assert rows["TT:0001"]["equivalent_cuis"] == ["TT:9001"]


def test_read_obo_entity_type(spark, tmp_path):
    ents = read_obo(spark, _write_obo(tmp_path), entity_type="thing")
    assert ents.first()["types"] == ["thing"]


def test_trie_extraction_matches_reference(spark):
    """Word-start anchoring, word-boundary guard, multi-match per start."""
    docs = spark.createDataFrame(
        [
            (1, "the acme widget spins"),        # simple hit
            (2, "widgets are not matched"),      # boundary guard: 'widgets'
            (3, "acme widget co makes a widget"),# overlapping dict entries
            (4, "midwidget is not a hit"),       # not word-start anchored
            (5, ""),                             # empty text
        ],
        "doc_id long, text string",
    )
    aliases = spark.createDataFrame(
        [
            ("widget", "C1"),
            ("acme widget", "C2"),
            ("acme widget co", "C3"),
        ],
        "alias string, cui string",
    )
    got = sorted(
        (r["doc_id"], r["mention"], r["cui"], r["start"], r["end"])
        for r in extract_dictionary_mentions(docs, aliases).collect()
    )
    assert got == [
        (1, "acme widget", "C2", 4, 15),
        (1, "widget", "C1", 9, 15),
        (3, "acme widget", "C2", 0, 11),
        (3, "acme widget co", "C3", 0, 14),
        (3, "widget", "C1", 5, 11),
        (3, "widget", "C1", 23, 29),
    ]


def test_trie_extraction_boundary_is_alnum_rule(spark):
    """The reference guard skips matches followed by [a-z0-9] but allows
    punctuation (text[j+1].isalnum(), extract_pubmed_entities.py:87)."""
    docs = spark.createDataFrame(
        [(1, "widget, widget9 widget")], "doc_id long, text string"
    )
    aliases = spark.createDataFrame([("widget", "C1")], "alias string, cui string")
    got = sorted(
        (r["start"], r["end"])
        for r in extract_dictionary_mentions(docs, aliases).collect()
    )
    # 'widget,' matches (comma boundary); 'widget9' does not; final matches
    assert got == [(0, 6), (16, 22)]


def test_read_obo_duplicate_cui_keeps_first_in_file_order(spark, tmp_path):
    """Duplicate ids resolve to the FIRST stanza in file order (the
    reference warns + keeps the first; ontology.py:100-104) — stable under
    repartition/task retry because the dedup orders on the stanza ordinal
    captured before any shuffle."""
    dup = OBO_FIXTURE + textwrap.dedent("""\

        [Term]
        id: TT:0001
        name: impostor
    """)
    p = tmp_path / "dup.obo"
    p.write_text(dup)
    rows = {r["cui"]: r for r in read_obo(spark, str(p)).collect()}
    assert rows["TT:0001"]["name"] == "widget"


def test_trie_broadcast_size_guard(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    aliases = spark.createDataFrame(
        [("a", "C1"), ("b", "C2"), ("c", "C3")], "alias string, cui string"
    )
    with pytest.raises(ValueError, match="broadcast-trie cap"):
        extract_dictionary_mentions(docs, aliases, max_alias_rows=2).collect()
