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

DEFAULT_WEIGHTS = {"jw": 0.35, "tslev": 0.30, "cosine": 0.35}
DEFAULT_THRESHOLD = 0.82

_SCORE_SCHEMA = StructType(
    [
        StructField("jw", DoubleType()),
        StructField("tslev", DoubleType()),
        StructField("cosine", DoubleType()),
    ]
)


def embed_udf():
    """title+body text → pooled deterministic embedding (array<float>)."""
    from pyspark.sql.types import ArrayType, FloatType

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield pd.Series(embed_batch(batch, DIM))

    return _udf


def score_components_udf():
    """(title_a, title_b, emb_a, emb_b) → struct(jw, tslev, cosine).

    One fused kernel per Arrow batch: two string metrics + one vectorized
    cosine — the pair's only trip through Python.
    """

    @F.pandas_udf(_SCORE_SCHEMA)
    def _udf(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series, pd.Series]]
    ) -> Iterator[pd.DataFrame]:
        for ta, tb, ea, eb in it:
            jw = jaro_winkler_batch(ta, tb)
            ts = token_set_lev_batch(ta, tb)
            ma = np.stack(
                [np.asarray(v, dtype=np.float64) if v is not None else np.zeros(DIM) for v in ea]
            )
            mb = np.stack(
                [np.asarray(v, dtype=np.float64) if v is not None else np.zeros(DIM) for v in eb]
            )
            num = np.einsum("ij,ij->i", ma, mb)
            den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(den > 0, num / den, 0.0)
            yield pd.DataFrame({"jw": jw, "tslev": ts, "cosine": cos})

    return _udf


def build_features(records: DataFrame) -> DataFrame:
    """Per-record scoring features: normalized title + pooled embedding of
    the extracted text. One narrow projection, computed once, joined twice.
    """
    return records.select(
        "url",
        "norm_title",
        embed_udf()(F.col("extracted_text")).alias("embedding"),
    )


def score_pairs(
    pairs: DataFrame,
    features: DataFrame,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """pairs(url_a, url_b) × features → scored edges.

    Output: (url_a, url_b, jw, tslev, cosine, score). The two feature joins
    shuffle `pairs` by url_a then url_b; `features` is shuffled once per
    probe on url — at cluster scale features is bucketed by url so both
    probes are shuffle-free on the build side.
    """
    w = weights or DEFAULT_WEIGHTS
    fa = features.select(
        F.col("url").alias("url_a"),
        F.col("norm_title").alias("title_a"),
        F.col("embedding").alias("emb_a"),
    )
    fb = features.select(
        F.col("url").alias("url_b"),
        F.col("norm_title").alias("title_b"),
        F.col("embedding").alias("emb_b"),
    )
    joined = pairs.join(fa, "url_a").join(fb, "url_b")
    scored = joined.withColumn(
        "components",
        score_components_udf()(
            F.col("title_a"), F.col("title_b"), F.col("emb_a"), F.col("emb_b")
        ),
    ).select(
        "url_a",
        "url_b",
        F.col("components.jw").alias("jw"),
        F.col("components.tslev").alias("tslev"),
        F.col("components.cosine").alias("cosine"),
    )
    return scored.withColumn(
        "score",
        F.col("jw") * w["jw"] + F.col("tslev") * w["tslev"] + F.col("cosine") * w["cosine"],
    )


def threshold_edges(scored: DataFrame, threshold: float = DEFAULT_THRESHOLD) -> DataFrame:
    """Matching predicate (P10 analog): keep edges with score >= threshold."""
    return scored.filter(F.col("score") >= threshold).select(
        "url_a", "url_b", F.col("score").alias("weight")
    )
