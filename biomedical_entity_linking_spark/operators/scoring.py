"""Stage 3: pairwise scoring of candidate pairs.

Reference semantics: ranked cosine / inner-product similarity between
mention and candidate vectors (``bioel/bioel/models/scispacy/
entity_linking.py:114-129``, ``sapbert/model/model_wrapper.py:72-133``),
thresholded (score > 0.7 at ``entity_linking.py:120-127``; edge threshold at
``special_partition.pyx:376-377``). The web graft scores each candidate pair
with Jaro-Winkler + token-set Levenshtein on normalized titles and cosine
over pooled embeddings of the page text, combined into one edge weight.

Plan shape: pairs(url_a, url_b) joins the (small) per-record feature
projection twice — feature side is pre-shuffled once on url and reused for
both probes. All kernels run in ONE fused Arrow pandas UDF so each pair
crosses the Python boundary exactly once.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StructField,
    StructType,
)

from ..functions.embeddings import DIM, embed_batch
from ..functions.strings import jaro_winkler_batch, token_set_lev_batch

# body cosine carries the largest weight: with identical normalized titles
# (jw = tslev = 1 -> 0.55 base) an edge still needs body cosine >= 0.6 —
# a 4.8σ event for unrelated 64-dim pooled embeddings, so viral-title
# blocks cannot merge through title similarity alone
DEFAULT_WEIGHTS = {"jw": 0.30, "tslev": 0.25, "cosine": 0.45}
DEFAULT_THRESHOLD = 0.82

_SCORE_SCHEMA = StructType(
    [
        StructField("jw", DoubleType()),
        StructField("tslev", DoubleType()),
    ]
)


SCORING_DIM = 64  # random-projection hash embeddings: 64 dims separate
#                   near-identical bodies (cos ≈ 1) from unrelated ones
#                   (cos ~ N(0, 1/8)): the identical-title false-merge
#                   cosine cutoff (0.486) sits at 3.9σ (p ≈ 5e-5/pair) —
#                   at 32 dims it was 2.7σ (0.23%/pair), measurably too
#                   high for viral-title blocks at web scale
QUANT_SCALE = 127  # int8 quantization of the unit vector


def embed_udf(dim: int = SCORING_DIM):
    """title+body text → pooled deterministic embedding, int8-quantized.

    The unit vector is scaled by 127 and stored as array<tinyint> — 8x
    fewer shuffle bytes than float64 when the pair join ships two
    embeddings per candidate pair (X11 analog: the reference stores
    vectors in fp16 on disk, ``scispacy_embeddings.py:143-146``)."""
    from pyspark.sql.types import ArrayType, ByteType

    @F.pandas_udf(ArrayType(ByteType()))
    def _udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        from ..functions.embeddings import BulkTokenCache

        cache = BulkTokenCache(dim)
        for batch in texts:
            vecs = embed_batch(batch, dim, cache, as_numpy=True)
            q = np.clip(np.round(vecs * QUANT_SCALE), -127, 127).astype(np.int8)
            # tolist() is a single C-level conversion — a per-element
            # Python loop here was measured to dominate the whole stage
            yield pd.Series(q.tolist())

    return _udf


def score_components_udf():
    """(title_a, title_b) → struct(jw, tslev).

    Strings-only through the Python boundary: shipping the embedding arrays
    through Arrow into pandas was measured to dominate the stage (the
    list→object conversion costs more than the metrics), so the cosine is
    computed JVM-side in whole-stage codegen (see ``_cosine_expr``) and only
    the two string metrics cross into Python.
    """

    @F.pandas_udf(_SCORE_SCHEMA)
    def _udf(
        it: Iterator[tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        for ta, tb in it:
            jw = jaro_winkler_batch(ta, tb)
            ts = token_set_lev_batch(ta, tb)
            yield pd.DataFrame({"jw": jw, "tslev": ts})

    return _udf


def _dot_expr(x, y):
    """JVM-side dot product of two int8-quantized embedding columns via
    zip_with + aggregate — Catalyst expressions, no Arrow transfer."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(x):
    """|x| for an int8-quantized embedding column. Evaluated per RECORD on
    the feature join sides, never per pair: cosine needs 3 dot products,
    but two of them depend on one side only — staging the norms turns
    O(pairs·D) norm work into O(records·D) (and the expressions evaluate
    interpreted inside HOFs, with no common-subexpression elimination, so
    an inline denominator referenced twice by the zero-guard would cost
    4 dots + 2 sqrt per pair). Same float op order as the inline form
    (sqrt per side, then multiply) → bit-identical scores."""
    return F.sqrt(_dot_expr(x, x))


def _cosine_expr(a, b, norm_a, norm_b):
    """Catalyst-side cosine: dot(a,b) / (|a|·|b|) with the norms staged as
    per-record columns (see ``_norm_expr``). Zero vectors (empty text)
    yield cosine 0."""
    den = norm_a * norm_b
    return F.when(den > 0, _dot_expr(a, b) / den).otherwise(F.lit(0.0))


def build_features(records: DataFrame) -> DataFrame:
    """Per-record scoring features: normalized title + pooled embedding of
    the extracted text. One narrow projection, computed once, joined twice.

    Repartitioned first: checkpoint tables at sandbox scale are few files,
    and the embedding UDF is CPU-bound — spread it across all workers.
    """
    n_parts = int(records.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # project BEFORE the round-robin repartition: the shuffle then ships
    # only (rid, norm_title, extracted_text), not the full record row —
    # shuffle bytes are the non-scaling cost on a single box
    return (
        records.select("rid", "norm_title", "extracted_text")
        .repartition(n_parts)
        .select(
            "rid",
            "norm_title",
            embed_udf()(F.col("extracted_text")).alias("embedding"),
        )
    )


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    weights: dict[str, float] | None = None,
    prune_threshold: float | None = DEFAULT_THRESHOLD,
) -> DataFrame:
    """pairs(rid_a, rid_b) × features → scored edges.

    Output: (rid_a, rid_b, jw, tslev, cosine, score, pruned). The two
    feature joins shuffle `pairs` by rid_a then rid_b (8-byte keys); at
    cluster scale features is bucketed by rid so the build side is
    shuffle-free.

    Over-retrieve-then-refine (the reference's X6 pattern,
    ``scispacy/evaluate.py:86``): the cosine is computed first, JVM-side
    (free relative to the Python string kernels). When ``prune_threshold``
    is set, pairs whose *maximum possible* combined score
    ``w_jw + w_tslev + w_cos*cos`` is below it never enter Python — they
    are emitted with ``pruned = true``, NULL string metrics, and that upper
    bound as their score, which by construction is below the edge
    threshold, so the thresholded edge set is bit-identical to the
    unpruned computation. Measured ~10x fewer pairs through the Python
    boundary on web-corpus workloads.
    """
    w = weights or DEFAULT_WEIGHTS
    fa = features.select(
        F.col("rid").alias("rid_a"),
        F.col("norm_title").alias("title_a"),
        F.col("embedding").alias("emb_a"),
        _norm_expr(F.col("embedding")).alias("norm_a"),
    )
    fb = features.select(
        F.col("rid").alias("rid_b"),
        F.col("norm_title").alias("title_b"),
        F.col("embedding").alias("emb_b"),
        _norm_expr(F.col("embedding")).alias("norm_b"),
    )
    # AQE coalesces by *bytes*; scored pairs are byte-small but CPU-heavy in
    # the Python kernel, so an explicit round-robin repartition is required
    # to spread the UDF across all workers (otherwise the whole stage lands
    # on 1-2 post-shuffle partitions and serializes).
    n_parts = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    joined = pairs.join(fa, "rid_a").join(fb, "rid_b")
    # cosine in JVM (embeddings are unit vectors → dot product) BEFORE the
    # round-robin repartition: the embedding arrays are consumed and
    # dropped where the join produced them, so the spreading shuffle ships
    # ~90 B/pair (ids + titles + one double) instead of ~220 B — and the
    # arrays never reach the Python boundary either
    with_cos = (
        joined.withColumn(
            "cosine",
            _cosine_expr(
                F.col("emb_a"), F.col("emb_b"), F.col("norm_a"), F.col("norm_b")
            ),
        )
        .select("rid_a", "rid_b", "title_a", "title_b", "cosine")
        .repartition(n_parts)
    )

    if prune_threshold is not None:
        # minimum cosine at which the combined score can still reach the
        # threshold even with perfect string similarity
        cos_min = (prune_threshold - w["jw"] - w["tslev"]) / w["cosine"]
        survivor = F.col("cosine") >= cos_min
    else:
        survivor = F.lit(True)

    # Single-path prune: pruned rows enter the kernel as ("", "") — the
    # equal-string short-circuit makes them ~free — and their metrics are
    # masked to NULL afterwards. No union, no second join.
    comp = score_components_udf()(
        F.when(survivor, F.col("title_a")).otherwise(F.lit("")),
        F.when(survivor, F.col("title_b")).otherwise(F.lit("")),
    )
    scored = with_cos.withColumn("components", comp).select(
        "rid_a",
        "rid_b",
        F.when(survivor, F.col("components.jw")).alias("jw"),
        F.when(survivor, F.col("components.tslev")).alias("tslev"),
        "cosine",
        (~survivor).alias("pruned"),
    )
    return scored.withColumn(
        "score",
        F.when(
            ~F.col("pruned"),
            F.col("jw") * w["jw"]
            + F.col("tslev") * w["tslev"]
            + F.col("cosine") * w["cosine"],
        ).otherwise(
            # upper bound — provably below the edge threshold for pruned rows
            F.lit(w["jw"] + w["tslev"]) + F.col("cosine") * w["cosine"]
        ),
    )


def threshold_edges(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Matching predicate (P10 analog): keep edges with score >= threshold."""
    return scored.filter(F.col("score") >= threshold).select(
        "rid_a", "rid_b", F.col("score").alias("weight")
    )
