"""Deterministic synthetic ``pages`` corpus with planted duplicate clusters.

Implements FIXTURES.md §1-3: Common-Crawl-style pages in entity clusters of
size 1-8 whose title/url variants mirror how the reference's aliases vary —
case changes (``sapbert/data/utils.py:88``), separator swaps
(``scispacy_embeddings.py:58``), abbreviation vs long form
(``bigbio_utils.py:322-341``), token reordering, truncation, mirrored
domains. Adversarial rows: hard negatives (near-duplicate titles across
different entities — the shared-alias analog,
``candidate_generation.py:60-67``), one viral title shared by many distinct
entities (hot blocking key → exercises salting/caps), and empty titles
(zero-vector guard analog, ``candidate_generation.py:142-159``).

Everything is seeded — same (n_entities, seed) → byte-identical corpus.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

_VOCAB = [
    "alpha", "analytics", "archive", "atlas", "aurora", "bazaar", "beacon",
    "bridge", "cascade", "catalog", "cipher", "cobalt", "compass", "console",
    "crystal", "delta", "digest", "domain", "engine", "ember", "falcon",
    "forum", "fusion", "garden", "gateway", "granite", "harbor", "horizon",
    "index", "insight", "journal", "jupiter", "kernel", "lattice", "ledger",
    "lighthouse", "matrix", "meadow", "mercury", "meridian", "monitor",
    "nebula", "nexus", "oracle", "orbit", "outpost", "panel", "phoenix",
    "pioneer", "portal", "prism", "quartz", "quasar", "radar", "registry",
    "relay", "report", "river", "rocket", "saffron", "satellite", "sentinel",
    "signal", "silver", "summit", "survey", "tangent", "terrace", "tracker",
    "trellis", "tribune", "tunnel", "vector", "vertex", "voyager", "willow",
    "workshop", "zenith", "zephyr", "zodiac",
]

_TLDS = ["com", "org", "net", "io", "dev"]
_MIRRORS = ["", "www.", "m.", "amp."]
_EPOCH = datetime(2024, 1, 1)


@dataclass
class Corpus:
    pages: pd.DataFrame        # url, warc_ts, html, text, lang
    gold_clusters: pd.DataFrame  # url, cluster_id


def _title_words(rng: np.random.RandomState, k: int) -> list[str]:
    return [_VOCAB[i] for i in rng.choice(len(_VOCAB), size=k, replace=False)]


def _perturb_title(rng: np.random.RandomState, words: list[str]) -> str:
    """A same-entity title variant: mild, similarity-preserving edits."""
    w = list(words)
    mode = rng.randint(5)
    if mode == 0 and len(w) >= 2:           # token reorder (token-set invariant)
        i, j = rng.choice(len(w), size=2, replace=False)
        w[i], w[j] = w[j], w[i]
    elif mode == 1 and len(w) >= 4:         # truncation: drop last token
        w = w[:-1]
    elif mode == 2:                         # abbreviation: shorten one token
        i = rng.randint(len(w))
        if len(w[i]) > 5:
            w[i] = w[i][:4]
    elif mode == 3:                         # case change
        w = [t.upper() if rng.rand() < 0.5 else t.title() for t in w]
    # mode 4: identical title
    sep = " - " if rng.rand() < 0.15 else " "
    return sep.join(w)


def _perturb_body(rng: np.random.RandomState, words: list[str]) -> str:
    w = list(words)
    n_swap = rng.randint(0, max(1, len(w) // 12) + 1)
    for _ in range(n_swap):
        w[rng.randint(len(w))] = _VOCAB[rng.randint(len(_VOCAB))]
    return " ".join(w)


def _slug(words: list[str], rng: np.random.RandomState) -> str:
    sep = rng.choice(["-", "_", "."])
    return sep.join(t.lower() for t in words[:3])


def _html(title: str, body: str, rng: np.random.RandomState) -> bytes:
    # vary markup shape so extraction is exercised, text contract unchanged
    attr = ' class="main"' if rng.rand() < 0.3 else ""
    head = f"<head><meta charset=\"utf-8\"><title>{title}</title></head>"
    return (
        f"<html{attr}>{head}<body{attr}><p>{body}</p></body></html>".encode("utf-8")
    )


def generate_corpus(n_entities: int = 200, seed: int = 42) -> Corpus:
    """Generate the deterministic corpus.

    ~2.6 pages/entity on average (cluster sizes 1-8, skewed small), plus
    ~2% viral-title singletons, ~2% hard-negative twins, ~1% empty-title
    rows, ~3% recrawls (same url, later warc_ts), ~5% non-eng pages.
    """
    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    gold: list[dict] = []
    cluster_id = 0

    for _ in range(n_entities):
        size = int(rng.choice([1, 1, 2, 2, 3, 3, 4, 5, 6, 8]))
        k = int(rng.randint(3, 6))
        words = _title_words(rng, k)
        body_words = [_VOCAB[i] for i in rng.choice(len(_VOCAB), size=40)]
        domain_core = f"{words[0]}{words[1]}.{_TLDS[rng.randint(len(_TLDS))]}"
        for v in range(size):
            title = " ".join(words) if v == 0 else _perturb_title(rng, words)
            body = _perturb_body(rng, body_words)
            mirror = _MIRRORS[rng.randint(len(_MIRRORS))] if v > 0 else ""
            url = f"https://{mirror}{domain_core}/{_slug(words, rng)}/{v}"
            lang = "eng" if rng.rand() > 0.05 else rng.choice(["deu", "fra", "spa"])
            ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 10_000_000)))
            rows.append(_row(url, ts, title, body, lang))
            gold.append({"url": url, "cluster_id": cluster_id})
            # recrawl: same url, later ts, same content (latest-wins dedup)
            if rng.rand() < 0.03:
                rows.append(_row(url, ts + timedelta(days=7), title, body, lang))
        cluster_id += 1

    # hard negatives: twin entity whose title differs by one distinctive token
    n_hard = max(1, n_entities // 50)
    for _ in range(n_hard):
        k = 4
        words = _title_words(rng, k)
        for twin in range(2):
            w = list(words)
            w[-1] = _VOCAB[rng.randint(len(_VOCAB))] if twin else w[-1]
            body_words = [_VOCAB[i] for i in rng.choice(len(_VOCAB), size=40)]
            domain_core = f"{w[0]}{w[-1]}.{_TLDS[rng.randint(len(_TLDS))]}"
            url = f"https://{domain_core}/{_slug(w, rng)}"
            ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 10_000_000)))
            rows.append(_row(url, ts, " ".join(w), " ".join(body_words), "eng"))
            gold.append({"url": url, "cluster_id": cluster_id})
            cluster_id += 1

    # viral title: many distinct entities sharing one exact title (hot key)
    n_viral = max(2, n_entities // 50)
    for _ in range(n_viral):
        body_words = [_VOCAB[i] for i in rng.choice(len(_VOCAB), size=40)]
        url = f"https://{_VOCAB[rng.randint(len(_VOCAB))]}site{cluster_id}.com/untitled"
        ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 10_000_000)))
        rows.append(_row(url, ts, "Untitled Document", " ".join(body_words), "eng"))
        gold.append({"url": url, "cluster_id": cluster_id})
        cluster_id += 1

    # empty-title rows (zero-shingle guard)
    for _ in range(max(1, n_entities // 100)):
        body_words = [_VOCAB[i] for i in rng.choice(len(_VOCAB), size=30)]
        url = f"https://blank{cluster_id}.net/x"
        ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 10_000_000)))
        rows.append(_row(url, ts, "", " ".join(body_words), "eng"))
        gold.append({"url": url, "cluster_id": cluster_id})
        cluster_id += 1

    pages = pd.DataFrame(rows)
    gold_df = pd.DataFrame(gold)
    return Corpus(pages=pages, gold_clusters=gold_df)


def _row(url: str, ts: datetime, title: str, body: str, lang: str) -> dict:
    from hashlib import blake2b

    digest = blake2b((url + ts.isoformat()).encode("utf-8"), digest_size=4).digest()
    rng_local = np.random.RandomState(
        int.from_bytes(digest, "big")
    )  # only used for markup variation; blake2b keeps it PYTHONHASHSEED-proof
    html = _html(title, body, rng_local)
    # byte-identity contract: extraction yields title + "\n" + body with
    # whitespace collapsed — title/body are generated already collapsed.
    text = title + "\n" + body
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang,
    }


def generate_pages_distributed(
    spark,
    n_entities: int,
    seed: int = 42,
    body_tokens: int = 40,
    partitions: int | None = None,
):
    """Spark-parallel corpus generation for bench-scale corpora.

    Each entity is generated from ``RandomState(seed ^ entity_id)`` so the
    output is deterministic and independent of partitioning. Adversarial
    roles are assigned by entity-id arithmetic: ``id % 50 == 49`` → viral
    title, ``id % 97 == 0`` → empty title, ``id % 53 in (0, 1)`` →
    hard-negative twins (twins share their word stem via the even id).

    Vocabulary scales with the corpus (Zipf-like): each title/body token is
    drawn from the small hot vocabulary with prob ~0.25, otherwise from a
    synthetic long-tail space of ~10M distinct words. Without this, large
    corpora built from a fixed 80-word vocabulary become adversarially
    self-similar (measured: 36 candidate pairs/page at 1M entities — every
    title collides with thousands of others at true-Jaccard level, which no
    real web corpus exhibits).

    Returns (pages_df, gold_df): same schemas as ``corpus_to_spark``.
    """
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _word(rng: np.random.RandomState) -> str:
        if rng.rand() < 0.25:
            return _VOCAB[rng.randint(len(_VOCAB))]
        return f"{_VOCAB[rng.randint(len(_VOCAB))]}{rng.randint(10_000_000)}"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                eid = int(eid)
                rng = np.random.RandomState((seed ^ (eid * 2654435761)) % (2**32))
                role_viral = eid % 50 == 49
                role_empty = eid % 97 == 0
                role_twin = eid % 53 in (0, 1)
                if role_twin:
                    stem_rng = np.random.RandomState(
                        (seed ^ ((eid - eid % 2) * 2654435761) ^ 7) % (2**32)
                    )
                    words = [_word(stem_rng) for _ in range(4)]
                    if eid % 2 == 1:
                        words = words[:-1] + [_word(rng)]
                else:
                    words = [_word(rng) for _ in range(int(rng.randint(3, 6)))]
                body_words = [_word(rng) for _ in range(body_tokens)]
                if role_viral or role_empty or role_twin:
                    size = 1
                else:
                    size = int(rng.choice([1, 1, 2, 2, 3, 3, 4, 5, 6, 8]))
                domain_core = (
                    f"{words[0]}{words[1]}.{_TLDS[rng.randint(len(_TLDS))]}"
                )
                for v in range(size):
                    if role_viral:
                        title = "Untitled Document"
                        url = f"https://{words[0]}site{eid}.com/untitled"
                    elif role_empty:
                        title = ""
                        url = f"https://blank{eid}.net/x"
                    else:
                        title = (
                            " ".join(words) if v == 0 else _perturb_title(rng, words)
                        )
                        mirror = _MIRRORS[rng.randint(len(_MIRRORS))] if v > 0 else ""
                        url = f"https://{mirror}{domain_core}/{_slug(words, rng)}/{v}"
                    body = _perturb_body(rng, body_words)
                    ts = _EPOCH + timedelta(seconds=int(rng.randint(0, 10_000_000)))
                    lang = (
                        "eng"
                        if rng.rand() > 0.05
                        else str(rng.choice(["deu", "fra", "spa"]))
                    )
                    r = _row(url, ts, title, body, lang)
                    r["cluster_id"] = eid
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_ts", "html", "text", "lang", "cluster_id"],
            )

    base = spark.range(0, n_entities, numPartitions=partitions)
    out_schema = (
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, cluster_id long"
    )
    full = base.mapInPandas(gen, out_schema)
    pages = full.select("url", "warc_ts", "html", "text", "lang")
    gold = full.select("url", "cluster_id")
    return pages, gold


def corpus_to_spark(spark, corpus: Corpus):
    """Materialize as Spark DataFrames with the input-hint schema."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    pages_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    gold_schema = StructType(
        [StructField("url", StringType()), StructField("cluster_id", LongType())]
    )
    pages = spark.createDataFrame(corpus.pages, schema=pages_schema)
    gold = spark.createDataFrame(corpus.gold_clusters, schema=gold_schema)
    return pages, gold
