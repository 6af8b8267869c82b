"""URL canonicalization + host-level operators — the web-crawl front door.

A crawl-scale corpus arrives keyed by URL, and the same page surfaces
under dozens of spellings: scheme/host case, ``www.`` prefixes, default
ports, tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
shuffled query-parameter order, fragments, trailing slashes. Before any
content-level dedup (exact md5, MinHash, SimHash — ``operators/dedup``)
a pipeline collapses these SPELLING duplicates with a pure per-row
canonicalization — at 100 TB this is the cheapest dedup tier because it
needs no content bytes at all, only the key column, and the groupBy key
it produces is a short string with Zipf-bounded group sizes (a URL's
alias set is small by construction, so no salting is needed).

The ``documents`` test table carries no URL column, so — like
``mentions.offsets_roundtrip`` — each query SYNTHESIZES its input
deterministically from table values (doc_id, source) with all six noise
dimensions planted, then proves the canonicalizer collapses them. The
synthesis is mirrored verbatim in the DuckDB oracle, so the value-hash
certifies the canonicalization semantics, not the noise generator.

Everything is built-in Catalyst expressions (``regexp_extract`` /
``filter`` / ``array_sort`` / ``array_join``) — no UDFs; the per-row
stage fuses into the Parquet scan and the only shuffle is the final
counting groupBy. Every regex is RE2-compatible (no lookarounds, no
backrefs) so Spark's Java engine and DuckDB's RE2 agree byte-for-byte.

Reference analog: the reference normalizes entity KEYS before joining
(``bioel/bioel/utils/bigbio_utils.py:302-319`` lowercase/trim
canonicalization, ``bioel/bioel/ontology.py:361`` alias
canonicalization); this module is the same move applied to the web's
native key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# query parameters that never change page identity — the industry-standard
# strip list (Google Analytics, Facebook, Google Ads click ids, referrers)
_TRACKING_RE = r"^(utm_|fbclid=|gclid=|ref=)"


def _noisy_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, n_chars, url) with deterministic spelling noise.

    Six noise dimensions, each keyed to a residue of ``doc_id`` so the
    same canonical page recurs under different spellings at every scale
    factor (canonical-identity period = lcm(20 sources, 10 path, 8 sub,
    6 query-class) = 120 ≪ row count → every group is a real dup group):

    - scheme case        (doc_id % 2):  ``HTTPS://`` vs ``https://``
    - ``www.`` prefix    (doc_id % 3)
    - subdomain          (doc_id % 8 < 4): ``CDN.`` — REAL, must survive
    - host case          (always):  ``.COM`` and mixed-case source
    - default port       (doc_id % 5):  ``:443``
    - trailing slash     (doc_id % 4)
    - query-string class (doc_id % 6): tracking params, shuffled order,
      fragments — classes {0,1}, {2,3}, {4,5} are canonically equal
    """
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://"))
    www = F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    sub = F.when(d % 8 < 4, F.lit("CDN.")).otherwise(F.lit(""))
    host = F.concat(www, sub, F.col("source"), F.lit(".COM"))
    port = F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/Articles/"),
        (d % 10).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    k = (d % 10).cast("string")
    query = (
        F.when(d % 6 == 0, F.concat(F.lit("?utm_source=feed&id="), k, F.lit("&utm_campaign=x")))
        .when(d % 6 == 1, F.concat(F.lit("?id="), k))
        .when(d % 6 == 2, F.lit("?b=2&a=1&fbclid=XYZ"))
        .when(d % 6 == 3, F.lit("?a=1&b=2"))
        .when(d % 6 == 4, F.lit(""))
        .otherwise(F.lit("?gclid=Z#frag"))
    )
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "n_chars",
            F.concat(scheme, host, port, path, query).alias("url"),
        )
    )


# the same synthesis, verbatim, for the DuckDB oracle
_NOISY_URLS_SQL = """
SELECT doc_id, n_chars,
       concat(
         CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
         CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
         CASE WHEN doc_id % 8 < 4 THEN 'CDN.' ELSE '' END,
         source, '.COM',
         CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
         '/Articles/', CAST(doc_id % 10 AS VARCHAR),
         CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
         CASE doc_id % 6
           WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 10 AS VARCHAR), '&utm_campaign=x')
           WHEN 1 THEN concat('?id=', CAST(doc_id % 10 AS VARCHAR))
           WHEN 2 THEN '?b=2&a=1&fbclid=XYZ'
           WHEN 3 THEN '?a=1&b=2'
           WHEN 4 THEN ''
           ELSE '?gclid=Z#frag'
         END
       ) AS url
FROM documents
"""


def canonicalize(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Public API: append ``canon_host`` + ``canon_url`` to ANY DataFrame
    with a URL column — the reusable front door for user pipelines (the
    driver queries below are one consumer; a crawl-ingest job calling
    this right after the WARC scan is the intended other).

    RFC-3986-informed normalization: scheme and host lowercase (case-
    insensitive by spec), path case PRESERVED (case-sensitive by spec),
    ``www.`` and default ports stripped, fragment dropped, tracking
    params removed, surviving params sorted, trailing slash collapsed
    (empty path → ``/``). Idempotent: re-canonicalizing ``canon_url``
    is a fixed point (pinned by ``tests/test_weburl.py``). Each step is
    its own ``select`` so every regexp runs once per row (expression-
    staging discipline) and the whole chain stays inside one
    WholeStageCodegen span. Input columns pass through untouched;
    ``canon_host``/``canon_url`` names must be free.
    """
    keep = list(urls.columns)
    u = F.col(url_col)
    parts = urls.select(
        *keep,
        F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1)).alias("_scheme"),
        F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1)).alias("_hostport"),
        F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias("_path"),
        F.regexp_extract(u, r"\?([^#]*)", 1).alias("_query"),
    )
    staged = parts.select(
        *keep,
        "_scheme",
        F.regexp_replace(
            F.regexp_replace("_hostport", r"^www\.", ""), r":(80|443)$", ""
        ).alias("canon_host"),
        F.regexp_replace("_path", r"/+$", "").alias("_path_stripped"),
        F.array_join(
            F.array_sort(
                F.filter(
                    F.split("_query", "&"),
                    lambda x: (x != "") & (~x.rlike(_TRACKING_RE)),
                )
            ),
            "&",
        ).alias("_canon_query"),
    )
    return staged.select(
        *keep,
        "canon_host",
        F.concat(
            F.col("_scheme"),
            F.lit("://"),
            F.col("canon_host"),
            F.when(F.col("_path_stripped") == "", F.lit("/")).otherwise(
                F.col("_path_stripped")
            ),
            F.when(
                F.col("_canon_query") == "", F.lit("")
            ).otherwise(F.concat(F.lit("?"), F.col("_canon_query"))),
        ).alias("canon_url"),
    )


def _canonicalize(urls: DataFrame) -> DataFrame:
    """Query-shaped view of :func:`canonicalize` (drops the raw url)."""
    return canonicalize(urls).select(
        "doc_id", "n_chars", "canon_host", "canon_url"
    )


_CANONICALIZE_SQL = f"""
SELECT doc_id, n_chars, canon_host,
       concat(
         scheme, '://', canon_host,
         CASE WHEN path_stripped = '' THEN '/' ELSE path_stripped END,
         CASE WHEN canon_query = '' THEN '' ELSE concat('?', canon_query) END
       ) AS canon_url
FROM (
  SELECT doc_id, n_chars, scheme,
         regexp_replace(regexp_replace(hostport, '^www\\.', ''), ':(80|443)$', '') AS canon_host,
         regexp_replace(path, '/+$', '') AS path_stripped,
         -- coalesce: DuckDB regexp_extract yields NULL (not '') on no
         -- match, and NULL propagates through split/filter/join
         coalesce(array_to_string(
           list_sort(list_filter(string_split(query, '&'),
             x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE}'))),
           '&'), '') AS canon_query
  FROM (
    SELECT doc_id, n_chars,
           lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
           lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS hostport,
           regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query
    FROM ({_NOISY_URLS_SQL})
  )
)
"""


def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-level URL dedup: keep the first doc per canonical URL.

    Plan: per-row synthesize+canonicalize (fuses into the scan, one
    WholeStageCodegen span, zero pre-shuffle passes) → one groupBy on
    the canonical string → (first_doc = min doc_id, n_docs). At 100 TB
    the groupBy key is a bounded-cardinality short string with small
    groups (a page's spelling-alias set), so map-side combine collapses
    most of the shuffle and no skew handling is needed — the opposite
    regime from ``vocab_topk``'s 33.5M-distinct heavy tail.
    """
    return (
        _canonicalize(_noisy_urls(spark, sf_dir))
        .groupBy("canon_url")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("canon_url")
    )


URL_DEDUP_SQL = f"""
SELECT canon_url, min(doc_id) AS first_doc, CAST(count(*) AS BIGINT) AS n_docs
FROM ({_CANONICALIZE_SQL})
GROUP BY canon_url
ORDER BY canon_url
"""


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain corpus stats — the domain-level view every
    crawl pipeline filters on (domain blocklists, per-domain quotas,
    boilerplate-heavy-host detection).

    Registrable domain = last two host labels (a deliberate
    simplification of the Public Suffix List — exact PSL matching is a
    broadcast-join against the ~9k-rule suffix table, same shape as the
    tracking-param filter here; the documented divergence keeps the
    oracle dependency-free). One groupBy over ≤ distinct-domain keys.
    """
    canon = _canonicalize(_noisy_urls(spark, sf_dir))
    return (
        canon.select(
            F.regexp_extract("canon_host", r"([^.]+\.[^.]+)$", 1).alias("domain"),
            "canon_host",
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.countDistinct("canon_host").alias("n_hosts"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("domain")
    )


HOST_STATS_SQL = f"""
SELECT regexp_extract(canon_host, '([^.]+\\.[^.]+)$', 1) AS domain,
       CAST(count(DISTINCT canon_host) AS BIGINT) AS n_hosts,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM ({_CANONICALIZE_SQL})
GROUP BY domain
ORDER BY domain
"""


# ---------------------------------------------------------------------------
# snapshot diff: change detection between two crawl snapshots
# ---------------------------------------------------------------------------

def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, status) classifying every page across two
    crawl snapshots: added / removed / changed / unchanged.

    The incremental-crawl front door: before anything re-processes, a
    deployment diffs today's snapshot against yesterday's to route only
    the delta into the pipeline (``operators/incremental`` then attaches
    the added/changed rows). The two snapshots are SYNTHESIZED
    deterministically from the documents table (the test tables carry
    one snapshot), mirrored verbatim in the oracle:

    * yesterday = every doc except ``doc_id % 20 == 3`` (pages that only
      exist today → **added**);
    * today     = every doc except ``doc_id % 20 == 7`` (pages that
      vanished → **removed**);
    * today's content for ``doc_id % 5 == 0`` carries an edit (suffix
      marker) → **changed**; everything else is **unchanged**.

    Comparison is by md5 content hash, not content: at 100 TB the diff
    join ships 16-byte digests, never page bodies, and both snapshot
    tables arrive bucketed by the join key from their own ingest runs,
    so the FULL OUTER JOIN is a zero-shuffle sort-merge over
    co-partitioned buckets; the classification is a pure projection.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    yesterday = docs.filter(F.col("doc_id") % 20 != 3).select(
        "doc_id", F.md5("text").alias("h_old")
    )
    today = docs.filter(F.col("doc_id") % 20 != 7).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("h_new"),
    )
    return (
        yesterday.join(today, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("h_old").isNull(), F.lit("added"))
            .when(F.col("h_new").isNull(), F.lit("removed"))
            .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
        .orderBy("doc_id")
    )


SNAPSHOT_DIFF_SQL = """
WITH yesterday AS (
  SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 20 != 3
),
today AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
           AS h_new
  FROM documents WHERE doc_id % 20 != 7
)
SELECT coalesce(y.doc_id, t.doc_id) AS doc_id,
       CASE WHEN y.h_old IS NULL THEN 'added'
            WHEN t.h_new IS NULL THEN 'removed'
            WHEN y.h_old != t.h_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM yesterday y FULL OUTER JOIN today t ON y.doc_id = t.doc_id
ORDER BY doc_id
"""
