"""domain_posterior_scores: statistical power on a planted
two-distribution corpus, degenerate guards, and cross-engine parity
(the sf-dir query is covered in tests/test_oracle_parity.py)."""

import duckdb

from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import text_analysis as TA

S = TA.DOMAIN_SCALE


def _planted_corpus(spark, n_per_class=60, body_tokens=30, seed_mod=7):
    """Shared Zipf-ish body vocabulary + DISJOINT per-class stopword
    sets — the structure the driver corpus lacks (its lang column is
    independent of text), deterministic, no RNG."""
    rows = []
    body = [f"w{i % 17}" for i in range(body_tokens)]
    ref_stop = ["the", "and", "of"]
    alt_stop = ["der", "und", "von"]
    for i in range(2 * n_per_class):
        is_ref = i < n_per_class
        stop = ref_stop if is_ref else alt_stop
        # interleave 6 stopwords into the shared body, rotating
        # deterministically so docs differ
        toks = list(body)
        for j in range(6):
            toks.insert((i * seed_mod + j * 5) % len(toks), stop[j % 3])
        rows.append((i, " ".join(toks), int(is_ref)))
    return spark.createDataFrame(rows, "doc_id long, text string, ref int")


def test_separates_planted_distributions(spark):
    docs = _planted_corpus(spark)
    out = TA._domain_scores(docs, F.col("ref") == 1).collect()
    acc = sum(1 for r in out if r["pred_ref"] == r["is_ref"]) / len(out)
    assert acc >= 0.9, f"accuracy {acc} on planted two-distribution corpus"
    # discriminative stopwords must dominate the vote in both directions
    ref_votes = [r["ref_votes_q"] for r in out if r["is_ref"] == 1]
    alt_votes = [r["ref_votes_q"] for r in out if r["is_ref"] == 0]
    assert min(ref_votes) > max(alt_votes)


def test_vote_bounds_and_prior(spark):
    docs = _planted_corpus(spark, n_per_class=20)
    out = TA._domain_scores(docs, F.col("ref") == 1).collect()
    n_tok = out[0]["n_tokens"]
    for r in out:
        # each token's centered vote is within ±SCALE
        assert abs(r["ref_votes_q"]) <= r["n_tokens"] * S
        assert 0 < r["prior_q"] < S
        assert r["n_tokens"] == n_tok  # all planted docs same length


def test_empty_and_whitespace_docs_are_excluded(spark):
    docs = spark.createDataFrame(
        [(0, "a b c", 1), (1, "", 1), (2, "   ", 0), (3, "a b d", 0)],
        "doc_id long, text string, ref int",
    )
    out = TA._domain_scores(docs, F.col("ref") == 1).collect()
    assert [r["doc_id"] for r in out] == [0, 3]


def test_driver_query_parity_sf0001(spark):
    sf = "/root/testdata/sf0.001"
    got = [
        tuple(r) for r in TA.domain_posterior_scores(spark, sf).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(TA.DOMAIN_POSTERIOR_SQL).fetchall()]
    assert got == want
