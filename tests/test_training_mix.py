"""Training-mix operators: stratified sampling, shard packing, vocab."""

import pytest

from biomedical_entity_linking_spark.operators.text_analysis import (
    PACK_BUDGET,
    PACK_STREAMS,
    SAMPLE_DEFAULT_RATE,
    SAMPLE_RATES,
    shard_packing,
    stratified_sample,
    vocab_topk,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mix"))
    rows = []
    langs = ["en"] * 6 + ["zh", "de", "fr", "es", "xx"]
    for i in range(2000):
        lang = langs[i % len(langs)]
        rows.append((i, f"doc {i} body " + "tok " * (i % 37), lang, "crawl"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_stratified_sample_deterministic_and_rate_shaped(spark, docs_dir):
    a = stratified_sample(spark, docs_dir).toPandas()
    b = stratified_sample(spark, docs_dir).toPandas()
    assert a.equals(b)  # identical selection on rerun — resumable by design
    langs = ["en"] * 6 + ["zh", "de", "fr", "es", "xx"]
    totals = {
        lang: sum(1 for i in range(2000) if langs[i % len(langs)] == lang)
        for lang in set(langs)
    }
    kept = a.groupby("lang").size().to_dict()
    frac = {lang: kept.get(lang, 0) / totals[lang] for lang in totals}
    # keep-everything languages keep everything; sampled ones land near rate
    for lang in ("zh", "de", "fr", "es"):
        assert abs(frac[lang] - SAMPLE_RATES[lang]) < 1e-9
    assert abs(frac["en"] - SAMPLE_RATES["en"]) < 0.08
    assert abs(frac["xx"] - SAMPLE_DEFAULT_RATE) < 0.08
    assert (a["u"] < 1.0).all() and (a["u"] >= 0.0).all()


def test_shard_packing_invariants(spark, docs_dir):
    out = shard_packing(spark, docs_dir).toPandas()
    assert len(out) == 2000  # every document assigned exactly once
    assert set(out["stream"]) <= set(range(PACK_STREAMS))
    # a document starts strictly inside its shard's budget window
    assert (out["offset_in_shard"] >= 0).all()
    assert (out["offset_in_shard"] < PACK_BUDGET).all()
    # within a stream, docs pack sequentially: starts are non-decreasing in
    # doc_id order and each start = previous start + previous n_tokens
    for _, g in out.sort_values("doc_id").groupby("stream"):
        starts = (g["shard"] * PACK_BUDGET + g["offset_in_shard"]).to_numpy()
        expect = (g["n_tokens"].cumsum() - g["n_tokens"]).to_numpy()
        assert (starts == expect).all()


def test_vocab_topk_planted_frequencies(spark, tmp_path):
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "aa aa aa bb bb cc", "en", "s"),
            (2, "aa bb cc dd", "en", "s"),
            (3, "", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{d}/documents.parquet")
    out = vocab_topk(spark, d).toPandas()
    assert list(out["token"][:4]) == ["aa", "bb", "cc", "dd"]
    assert list(out["freq"][:4]) == [4, 3, 2, 1]


def test_vocab_topk_aqe_prunes_collision_repair_scan(spark, tmp_path):
    """The collision-repair branch (broadcast recount over a second
    corpus scan) must be pruned at RUNTIME when no hash group collides:
    AQE materializes the empty broadcast side first and propagates the
    empty relation, so the executed final plan has no Union and exactly
    one corpus FileScan — the single-scan contract vocab_topk's 100 TB
    story rests on."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, f"tok{i % 7} common word{i % 3}", "en", "s") for i in range(200)],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{d}/documents.parquet")
    df = vocab_topk(spark, d)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    final_section = executed.split("== Initial Plan ==")[0]
    assert "Union" not in final_section, "repair branch survived AQE"
    assert final_section.count("FileScan parquet") == 1, final_section


def test_pii_scrub_planted(spark, tmp_path):
    from biomedical_entity_linking_spark.operators.text_analysis import (
        pii_scrub,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "mail bob.smith+x@foo-bar.example.com now", "en", "s"),
            (2, "from 10.0.255.1 and 192.168.0.12 hosts", "en", "s"),
            (3, "call +1 415-555-0199 today", "en", "s"),
            (4, "clean text with no pii at all", "en", "s"),
            (5, "a@b.io and 8.8.8.8 and 00 1234 5678 99", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{d}/documents.parquet")
    out = pii_scrub(spark, d).toPandas().set_index("doc_id")
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "n_phones"] == 0
    assert out.loc[2, "n_ipv4"] == 2
    assert out.loc[3, "n_phones"] == 1
    assert (
        out.loc[4, ["n_emails", "n_ipv4", "n_phones"]] == 0
    ).all()
    assert out.loc[5, "n_emails"] == 1 and out.loc[5, "n_ipv4"] == 1
    assert out.loc[5, "n_phones"] == 1
    # redaction: clean text hashes to itself, dirty text does not
    import hashlib

    assert out.loc[4, "scrub_md5"] == hashlib.md5(
        b"clean text with no pii at all"
    ).hexdigest()
    assert out.loc[1, "scrub_md5"] == hashlib.md5(
        b"mail <EMAIL> now"
    ).hexdigest()


def test_leakage_safe_split_no_cluster_straddles(spark):
    """The leakage guard itself: every dup cluster lands in exactly one
    split, and split boundaries hold at cluster granularity."""
    from biomedical_entity_linking_spark.operators.text_analysis import (
        leakage_safe_split,
    )

    out = leakage_safe_split(spark, "/root/testdata/sf0.01").toPandas()
    per_cluster = out.groupby("cluster_id").split.nunique()
    assert (per_cluster == 1).all()
    # multi-member clusters exist (otherwise the guard is vacuous)
    assert (out.groupby("cluster_id").size() > 1).any()
    # all three splits materialize and cover every doc exactly once
    assert set(out.split) == {"train", "val", "test"}
    assert out.doc_id.is_unique and len(out) == 500


def test_lm_fluency_separates_fluent_from_garbled(spark):
    """Power test for lm_fluency (the driver corpus draws tokens i.i.d.
    so the oracle hash only certifies the mechanism): fluent docs (the
    reference bigram pattern) must beat deterministically garbled docs
    (same token multiset, adjacency destroyed) on BOTH statistics."""
    from biomedical_entity_linking_spark.operators.text_analysis import (
        _lm_fluency_core,
    )

    sent = "the cat sat on the mat and the dog ran to the cat".split()
    rows = [(i, " ".join(sent), "en") for i in range(20)]
    rows += [(100 + i, " ".join(sent), "xx") for i in range(5)]  # fluent
    rows += [(200 + i, " ".join(sorted(sent)), "xx") for i in range(5)]  # garbled
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = _lm_fluency_core(docs).toPandas().set_index("doc_id")
    fluent = out.loc[100:104]
    garbled = out.loc[200:204]
    # fluent bigrams all exist in the reference model
    assert int(fluent["oov_bigrams"].max()) == 0
    assert int(garbled["oov_bigrams"].min()) > 0
    assert int(fluent["mean_prob_micro"].min()) > int(
        garbled["mean_prob_micro"].max()
    )
    assert int(fluent["bits_per_bigram_micro"].max()) < int(
        garbled["bits_per_bigram_micro"].min()
    )
    # scored relation covers every >=2-token doc exactly once
    assert len(out) == 30
