"""Mention-surface operators: span windows, offsets codec, and the small
string/score scalar family.

Reference semantics covered here (SURVEY §2):

* P12 span-overlap filter — the reference drops overlapping extracted
  spans (``extract_pubmed_entities/extract_pubmed_entities.py:8-38``: sort
  by (start, -end), discard spans that overlap a later span). Re-expressed
  as the lag/lead window form SURVEY P12 prescribes: a span is kept iff it
  overlaps neither the previous nor the next span in start order.
  (Documented divergence: the reference's sequential discard cascade for
  chains of 3+ mutually-overlapping spans is order-dependent and
  unparallelizable; the two-sided adjacent test gives identical results on
  non-chained overlaps and deterministic results everywhere.)
* W6/F13 word-window context slice — up to ``CTX_WORDS`` words before and
  after a span (``bigbio_utils.py:302-319``).
* F2 offsets codec — offsets ↔ ``"s,e;s,e"`` string round-trip
  (``bigbio_utils.py:210-212,270-272``; ``evaluate.py:455-461``).
* F8 suffix strip — ``rstrip``-intent via anchored regexp_replace
  (``evaluate.py:481``; the reference's rstrip-as-charset bug is NOT
  replicated, per SURVEY F8).
* F10 min-max score normalization (``special_partition.pyx:216``,
  ``model_wrapper.py:95-98``).
* T1 array_except (alias-set minus canonical name,
  ``ontology.py:379-381``).

Spans are synthesized deterministically from the documents table: every
token of length ≥ ``SPAN_TOKEN_LEN`` at 0-based word position p opens the
word-coordinate span [p, p+SPAN_LEN). All queries are pure Catalyst and
have exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SPAN_TOKEN_LEN = 6
SPAN_LEN = 3
# context window: 64 words each side, matching the reference's
# max_context_length // 2 slice (bigbio_utils.py:302-319)
CTX_WORDS = 64

def _toks():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def _raw_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, start, end) in word coordinates — one span per long token."""
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.posexplode(_toks()).alias("pos", "tok"))
        .filter(F.length("tok") >= SPAN_TOKEN_LEN)
        .select(
            "doc_id",
            F.col("pos").alias("start"),
            (F.col("pos") + SPAN_LEN).alias("end"),
        )
    )


def mention_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 overlap filter + W6 context slices over synthesized spans."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = _raw_spans(docs)
    w = Window.partitionBy("doc_id").orderBy("start")
    kept = (
        spans.withColumn("prev_end", F.lag("end").over(w))
        .withColumn("next_start", F.lead("start").over(w))
        .filter(
            (F.col("prev_end").isNull() | (F.col("prev_end") <= F.col("start")))
            & (F.col("next_start").isNull() | (F.col("next_start") >= F.col("end")))
        )
        .select("doc_id", "start", "end")
    )
    toks_rel = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", _toks().alias("toks")
    )
    j = kept.join(toks_rel, "doc_id")
    s, e, toks = F.col("start"), F.col("end"), F.col("toks")
    n = F.size(toks)
    left_ctx = F.array_join(
        F.slice(toks, F.greatest(s - CTX_WORDS + 1, F.lit(1)), F.least(s, F.lit(CTX_WORDS))),
        " ",
    )
    right_ctx = F.array_join(
        F.slice(toks, e + 1, F.least(F.lit(CTX_WORDS), F.greatest(n - e, F.lit(0)))),
        " ",
    )
    mention = F.array_join(
        F.slice(toks, s + 1, F.least(F.lit(SPAN_LEN), n - s)), " "
    )
    return j.select(
        "doc_id",
        "start",
        "end",
        mention.alias("mention"),
        left_ctx.alias("left_ctx"),
        right_ctx.alias("right_ctx"),
    ).orderBy("doc_id", "start")


_SPANS_CTE = f"""
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
  WHERE length(trim(text)) > 0
),
spans AS (
  SELECT doc_id, i - 1 AS start, i - 1 + {SPAN_LEN} AS "end"
  FROM (SELECT doc_id,
               unnest(t) AS tok,
               unnest(generate_series(1, len(t))) AS i
        FROM toks)
  WHERE length(tok) >= {SPAN_TOKEN_LEN}
)
"""

MENTION_SPANS_SQL = f"""
WITH {_SPANS_CTE},
kept AS (
  SELECT doc_id, start, "end"
  FROM (
    SELECT doc_id, start, "end",
           lag("end") OVER (PARTITION BY doc_id ORDER BY start) AS prev_end,
           lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS next_start
    FROM spans
  )
  WHERE (prev_end IS NULL OR prev_end <= start)
    AND (next_start IS NULL OR next_start >= "end")
)
SELECT k.doc_id, k.start, k."end",
       array_to_string(t[k.start + 1 : least(k.start + {SPAN_LEN}, len(t))], ' ')
         AS mention,
       coalesce(array_to_string(
           t[greatest(k.start - {CTX_WORDS} + 1, 1) : k.start], ' '), '')
         AS left_ctx,
       coalesce(array_to_string(
           t[k."end" + 1 : least(k."end" + {CTX_WORDS}, len(t))], ' '), '')
         AS right_ctx
FROM kept k JOIN toks USING (doc_id)
ORDER BY doc_id, start
"""


def offsets_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 codec: spans → "s,e;s,e" string → re-parsed array (sum of starts
    recomputed from the RE-PARSED form proves the round trip)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = _raw_spans(docs)
    enc = (
        spans.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("start", "end"))),
                    lambda st: F.concat_ws(
                        ",", st["start"].cast("string"), st["end"].cast("string")
                    ),
                ),
                ";",
            ).alias("offsets_str")
        )
    )
    reparsed = F.transform(
        F.split(F.col("offsets_str"), ";"),
        lambda p: F.transform(F.split(p, ","), lambda x: x.cast("int")),
    )
    return enc.select(
        "doc_id",
        "offsets_str",
        F.size(reparsed).alias("n_spans"),
        F.aggregate(
            reparsed, F.lit(0), lambda acc, pair: acc + F.element_at(pair, 1)
        ).alias("sum_start"),
    ).orderBy("doc_id")


OFFSETS_ROUNDTRIP_SQL = f"""
WITH {_SPANS_CTE},
enc AS (
  SELECT doc_id,
         string_agg(start || ',' || "end", ';' ORDER BY start) AS offsets_str
  FROM spans
  GROUP BY doc_id
)
SELECT doc_id, offsets_str,
       len(string_split(offsets_str, ';')) AS n_spans,
       CAST(list_sum(list_transform(string_split(offsets_str, ';'),
                       p -> CAST(string_split(p, ',')[1] AS INT))) AS INT)
         AS sum_start
FROM enc
ORDER BY doc_id
"""


_STOPS = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]


def source_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 suffix strip + T1 array_except + F10 min-max normalization."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stops = F.array(*[F.lit(s) for s in _STOPS])
    content = F.array_except(F.array_distinct(_toks()), stops)
    base = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        "lang",
        F.regexp_replace("source", "[0-9]+$", "").alias("src_family"),
        F.size(content).alias("n_content"),
        F.col("n_chars"),
    )
    w = Window.partitionBy("lang")
    mn, mx = F.min("n_chars").over(w), F.max("n_chars").over(w)
    norm = F.when(mx == mn, F.lit(0.0)).otherwise(
        (F.col("n_chars") - mn) / (mx - mn)
    )
    return base.select(
        "doc_id",
        "src_family",
        "n_content",
        F.round(norm, 6).alias("norm_chars"),
    ).orderBy("doc_id")


_STOPS_SQL = "[" + ",".join(f"'{w}'" for w in _STOPS) + "]"

SOURCE_NORM_STATS_SQL = f"""
SELECT doc_id,
       regexp_replace(source, '[0-9]+$', '') AS src_family,
       len(list_filter(list_distinct(regexp_split_to_array(lower(trim(text)),
                                                           '\\s+')),
                       t -> NOT list_contains({_STOPS_SQL}, t))) AS n_content,
       round(CASE WHEN max(n_chars) OVER (PARTITION BY lang)
                       = min(n_chars) OVER (PARTITION BY lang) THEN 0.0
                  ELSE (n_chars - min(n_chars) OVER (PARTITION BY lang))
                       * 1.0
                       / (max(n_chars) OVER (PARTITION BY lang)
                          - min(n_chars) OVER (PARTITION BY lang))
             END, 6) AS norm_chars
FROM documents
WHERE length(trim(text)) > 0
ORDER BY doc_id
"""
