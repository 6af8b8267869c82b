"""URL canonicalization + host stats (operators/weburl)."""

import re

from pyspark.sql import functions as F

import pytest

from biomedical_entity_linking_spark.operators.weburl import (
    _canonicalize,
    _noisy_urls,
    host_stats,
    url_dedup,
)


@pytest.fixture(scope="module")
def url_docs(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("weburl"))
    rows = [
        (i, f"body {i}", "en", f"src{i % 20}", 100 + i) for i in range(1200)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


CANON_RE = re.compile(
    r"^https://(cdn\.)?src\d+\.com/Articles/\d(\?(a=1&b=2|id=\d))?$"
)


def test_canonical_shape_and_noise_removal(spark, url_docs):
    out = url_dedup(spark, url_docs).collect()
    assert len(out) > 0
    for row in out:
        u = row["canon_url"]
        # every noise dimension is gone; the real structure survives
        assert CANON_RE.match(u), u
        assert "WWW" not in u and "www." not in u
        assert ":443" not in u and ":80" not in u
        assert "utm_" not in u and "fbclid" not in u and "gclid" not in u
        assert "#" not in u
        assert not u.endswith("/")
        # path case is PRESERVED (case-sensitive per RFC 3986) while
        # scheme/host were lowercased
        assert "/Articles/" in u
    # dedup is total: group sizes sum to the corpus size
    assert sum(r["n_docs"] for r in out) == 1200


def test_different_spellings_collapse(spark, url_docs):
    # doc 0: trailing slash + WWW + :443 + utm params; doc 90: no slash,
    # same canonical identity (source src10 vs src0 differ → pick pair
    # with equal residues mod 20: 0 and 100 share source; use 0 vs 90?
    # 90 % 20 = 10 → different source. Compute from the synthesis itself:
    raw = {
        r["doc_id"]: r["url"]
        for r in _noisy_urls(spark, url_docs)
        .filter("doc_id in (0, 120, 100)")
        .collect()
    }
    canon = {
        r["doc_id"]: r["canon_url"]
        for r in _canonicalize(_noisy_urls(spark, url_docs))
        .filter("doc_id in (0, 120, 100)")
        .collect()
    }
    # doc 0 and doc 120 share every residue → same canonical
    assert canon[0] == canon[120]
    # the canonical string is genuinely rewritten from the raw spelling
    assert raw[0] != canon[0]
    assert raw[0].startswith("HTTPS://WWW.CDN.")
    assert canon[0] == "https://cdn.src0.com/Articles/0?id=0"
    # doc 100 (class 4: no query at all) canonicalizes query-free
    assert canon[100].endswith("/Articles/0")


def test_real_subdomain_survives(spark, url_docs):
    hosts = {
        r["canon_host"]
        for r in _canonicalize(_noisy_urls(spark, url_docs))
        .select("canon_host")
        .distinct()
        .collect()
    }
    # cdn. is a REAL subdomain and must survive; www. must not
    assert any(h.startswith("cdn.") for h in hosts)
    assert not any(h.startswith("www.") for h in hosts)
    assert all(h == h.lower() for h in hosts)


def test_host_stats_domains(spark, url_docs):
    out = {r["domain"]: r for r in host_stats(spark, url_docs).collect()}
    assert set(out) == {f"src{i}.com" for i in range(20)}
    for dom, row in out.items():
        # both the bare domain and its cdn. subdomain occur
        assert row["n_hosts"] == 2
        assert row["n_docs"] == 60  # 1200 docs / 20 sources
    assert sum(r["n_docs"] for r in out.values()) == 1200


def test_no_python_udf_in_plan(spark, url_docs):
    for fn in (url_dedup, host_stats):
        plan = fn(spark, url_docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_canonicalize_is_idempotent_and_preserves_columns(spark, url_docs):
    from biomedical_entity_linking_spark.operators.weburl import canonicalize

    urls = _noisy_urls(spark, url_docs)
    once = canonicalize(urls)
    # passthrough: every input column survives, plus exactly the two new
    assert once.columns == urls.columns + ["canon_host", "canon_url"]
    # fixed point: canonicalizing a canonical URL changes nothing
    again = canonicalize(
        once.select("doc_id", F.col("canon_url").alias("url")),
    )
    diff = (
        again.filter(F.col("url") != F.col("canon_url"))
        .limit(5)
        .collect()
    )
    assert diff == [], diff


def test_snapshot_diff_planted_structure(spark):
    """Every class lands exactly on its planted residue: added ≡ 3 (mod
    20), removed ≡ 7 (mod 20), changed ≡ 0 (mod 5) — the residues are
    constructed disjoint (3 and 7 mod 20 are never 0 mod 5)."""
    from biomedical_entity_linking_spark.operators.weburl import snapshot_diff

    out = snapshot_diff(spark, "/root/testdata/sf0.01").collect()
    by = {}
    for r in out:
        by.setdefault(r.status, set()).add(r.doc_id)
    assert all(d % 20 == 3 for d in by["added"])
    assert all(d % 20 == 7 for d in by["removed"])
    assert all(d % 5 == 0 for d in by["changed"])
    assert by["changed"] == {
        d for s in by.values() for d in s if d % 5 == 0
    }
    # union covers every doc exactly once
    n = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").count()
    assert sum(len(s) for s in by.values()) == n
