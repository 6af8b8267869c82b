"""Soundex expression: canonical vectors, property test vs an
independent pure-Python reference, cross-engine equality; multipass
blocking: inclusion–exclusion union vs materialized pairs, parity."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import (
    phonetic_blocking as PB,
)

SF = "/root/testdata/sf0.001"

CANONICAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
}

_CODE = {
    **{c: "1" for c in "BFPV"},
    **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"},
    "L": "4",
    **{c: "5" for c in "MN"},
    "R": "6",
}


def _py_soundex(word: str) -> str:
    """Independent reference: the textbook algorithm, letter by letter
    (H/W transparent, vowels separate, first letter's code dropped)."""
    w = "".join(c for c in word.upper() if c.isalpha() and c.isascii())
    if not w:
        return ""
    out = []
    prev = _CODE.get(w[0], "0")
    for c in w[1:]:
        if c in "HW":
            continue  # transparent: prev code survives
        code = _CODE.get(c, "0")
        if code != "0" and code != prev:
            out.append(code)
        prev = code
    return w[0] + "".join(out)[:3].ljust(3, "0")


def test_canonical_vectors(spark):
    df = spark.createDataFrame(
        [(w,) for w in CANONICAL], "w string"
    ).select("w", PB.soundex_expr(F.col("w")).alias("s"))
    got = {r["w"]: r["s"] for r in df.collect()}
    assert got == CANONICAL


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzHRW '",
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_matches_pure_python_reference(spark, words):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, w string"
    ).select("i", PB.soundex_expr(F.col("w")).alias("s"))
    got = {r["i"]: r["s"] for r in df.collect()}
    want = {i: _py_soundex(w) for i, w in enumerate(words)}
    assert got == want


def test_sql_mirror_identical(spark):
    words = list(CANONICAL) + ["", "   ", "123", "o'brien", "HW", "h"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", PB.soundex_expr(F.col("w")).alias("s")
    )
    got = {r["w"]: r["s"] for r in df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(w VARCHAR)")
    for w in words:
        con.execute("INSERT INTO t VALUES (?)", [w])
    want = dict(
        con.execute(f"SELECT w, {PB.soundex_sql('w')} FROM t").fetchall()
    )
    assert got == want


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return c


def test_union_is_exact_distinct_pair_count(spark):
    # ground truth by brute force: materialize every rule's pair set at
    # sf0.001 and take the true set union — must equal the
    # inclusion–exclusion count (no approximation hiding in the algebra)
    keyed = PB._keyed(spark, SF).toPandas().reset_index()
    import itertools

    union = set()
    per_rule = {}
    for rule in PB._RULES:
        pairs = set()
        for _, grp in keyed.groupby(rule):
            idx = sorted(grp["index"])
            pairs.update(itertools.combinations(idx, 2))
        per_rule[rule] = len(pairs)
        union |= pairs
    out = {
        r["scheme"]: r["cand_pairs"]
        for r in PB.multipass_blocking(spark, SF).collect()
    }
    for rule in PB._RULES:
        assert out[rule] == per_rule[rule]
    assert out["union"] == len(union)


def test_parity_sf0001(spark, con):
    got = [tuple(r) for r in PB.multipass_blocking(spark, SF).collect()]
    want = [
        tuple(r) for r in con.execute(PB.MULTIPASS_BLOCKING_SQL).fetchall()
    ]
    assert got == want
    by = {r[0]: r for r in got}
    # planted dup groups share the 24-char prefix → full completeness
    assert by["k_prefix"][4] == 1_000_000
    # union must dominate every single rule's candidate count
    assert by["union"][1] >= max(by[r][1] for r in PB._RULES)
