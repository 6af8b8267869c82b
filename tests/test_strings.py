"""String-metric kernels vs hand-computed oracle values (FIXTURES.md §6)."""

import math

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biomedical_entity_linking_spark.functions.strings import (
    jaro,
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    token_set_lev_batch,
    token_set_levenshtein_ratio,
)


class TestJaro:
    # classic textbook values
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("MARTHA", "MARHTA", 0.944444),
            ("DIXON", "DICKSONX", 0.766667),
            ("JELLYFISH", "SMELLYFISH", 0.896296),
            ("", "", 1.0),
            ("a", "", 0.0),
            ("abc", "abc", 1.0),
        ],
    )
    def test_known_values(self, a, b, expected):
        assert math.isclose(jaro(a, b), expected, abs_tol=1e-5)

    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("MARTHA", "MARHTA", 0.961111),
            ("DIXON", "DICKSONX", 0.813333),
            ("DWAYNE", "DUANE", 0.84),
        ],
    )
    def test_winkler_known_values(self, a, b, expected):
        assert math.isclose(jaro_winkler(a, b), expected, abs_tol=1e-5)

    @given(st.text(max_size=30), st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_symmetric_and_bounded(self, a, b):
        x = jaro_winkler(a, b)
        assert 0.0 <= x <= 1.0
        assert math.isclose(x, jaro_winkler(b, a), abs_tol=1e-12)


class TestLevenshtein:
    @pytest.mark.parametrize(
        "a,b,expected",
        [
            ("kitten", "sitting", 3),
            ("flaw", "lawn", 2),
            ("", "abc", 3),
            ("abc", "abc", 0),
            ("über", "uber", 1),  # unicode
        ],
    )
    def test_known_values(self, a, b, expected):
        assert levenshtein(a, b) == expected

    @given(st.text(max_size=20), st.text(max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_metric_properties(self, a, b):
        d = levenshtein(a, b)
        assert d == levenshtein(b, a)
        assert d >= abs(len(a) - len(b))
        assert d <= max(len(a), len(b))


class TestTokenSet:
    def test_reorder_invariant(self):
        assert token_set_levenshtein_ratio("alpha beta gamma", "gamma alpha beta") == 1.0

    def test_duplicate_invariant(self):
        assert token_set_levenshtein_ratio("a b b c", "c b a") == 1.0

    def test_partial(self):
        r = token_set_levenshtein_ratio("alpha beta gamma", "alpha beta delta")
        assert 0.5 < r < 1.0


def test_batch_kernels_match_scalar():
    a = pd.Series(["MARTHA", "kitten", "", None, "alpha beta"])
    b = pd.Series(["MARHTA", "sitting", "x", "y", "beta alpha"])
    jw = jaro_winkler_batch(a, b)
    ts = token_set_lev_batch(a, b)
    for i in range(len(a)):
        sa = a[i] if isinstance(a[i], str) else ""
        sb = b[i] if isinstance(b[i], str) else ""
        assert math.isclose(jw[i], jaro_winkler(sa, sb), abs_tol=1e-12)
        assert math.isclose(ts[i], token_set_levenshtein_ratio(sa, sb), abs_tol=1e-12)


@given(
    st.lists(
        st.tuples(st.text(max_size=25), st.text(max_size=25)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_vectorized_kernels_match_scalar_property(pairs):
    """The numpy-vectorized batch kernels are bit-compatible with the
    scalar reference implementations on arbitrary unicode inputs."""
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    jw = jaro_winkler_batch(a, b)
    ts = token_set_lev_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert math.isclose(jw[i], jaro_winkler(x, y), abs_tol=1e-12), (x, y)
        assert math.isclose(
            ts[i], token_set_levenshtein_ratio(x, y), abs_tol=1e-12
        ), (x, y)


class TestUniquifierShortCircuits:
    def test_equal_pairs_never_enter_work_set(self):
        from biomedical_entity_linking_spark.functions.strings import (
            _unique_pairs,
        )

        a = pd.Series(["same title", "same title", "alpha"])
        b = pd.Series(["same title", "same title", "beta"])
        codes, ulo, uhi, equal = _unique_pairs(a, b)
        # only the one non-equal pair is registered for the DP kernels
        assert list(equal) == [True, True, False]
        assert len(ulo) == 1 and len(uhi) == 1
        assert codes[2] == 0

    def test_all_equal_batch(self):
        a = pd.Series(["x", "x"])
        out = jaro_winkler_batch(a, a.copy())
        assert list(out) == [1.0, 1.0]
        out2 = token_set_lev_batch(a, a.copy())
        assert list(out2) == [1.0, 1.0]

    def test_lone_surrogates_do_not_raise(self):
        # str.encode('utf-32-le') is strict; the kernel must be total over
        # Python strs (direct pandas callers can hold lone surrogates)
        a = pd.Series(["ab\ud800cd", "plain"])
        b = pd.Series(["abcd", "plane"])
        out = jaro_winkler_batch(a, b)
        assert len(out) == 2 and all(0.0 <= v <= 1.0 for v in out)
        out2 = token_set_lev_batch(a, b)
        assert len(out2) == 2 and all(0.0 <= v <= 1.0 for v in out2)


class TestDuckDBBitEquality:
    """The pair_scores oracle (operators/string_scores.py) hashes UNROUNDED
    kernel semantics: DuckDB's independent jaro_winkler_similarity /
    levenshtein implementations must agree with the production kernels
    bit-for-bit on word-vocab titles — not merely to 1e-6."""

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.lists(
                    st.sampled_from(
                        "key agg row scan slow fast table value part "
                        "hash the line sort window batch spark".split()
                    ),
                    min_size=1,
                    max_size=5,
                ),
                st.lists(
                    st.sampled_from(
                        "key agg row scan slow fast table value part "
                        "hash the line sort window batch spark".split()
                    ),
                    min_size=1,
                    max_size=5,
                ),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_kernels_match_duckdb_bitwise(self, pairs):
        import duckdb

        a = pd.Series([" ".join(x) for x, _ in pairs])
        b = pd.Series([" ".join(y) for _, y in pairs])
        jw = jaro_winkler_batch(a, b).to_numpy()
        ts = token_set_lev_batch(a, b).to_numpy()
        con = duckdb.connect()
        con.register("p", pd.DataFrame({"a": a, "b": b}))
        d = con.execute(
            """
            SELECT jaro_winkler_similarity(a, b) AS jw,
                   CASE WHEN sa = sb THEN 1.0
                        ELSE 1.0 - CAST(levenshtein(sa, sb) AS DOUBLE)
                                   / greatest(length(sa), length(sb)) END
                     AS ts
            FROM (
              SELECT a, b,
                array_to_string(
                  list_sort(list_distinct(string_split(a, ' '))), ' ') AS sa,
                array_to_string(
                  list_sort(list_distinct(string_split(b, ' '))), ' ') AS sb
              FROM p)
            """
        ).df()
        assert (d["jw"].to_numpy() == jw).all()
        assert (d["ts"].to_numpy() == ts).all()
