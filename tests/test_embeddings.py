"""Deterministic pooled embeddings + cosine kernel."""

import math

import numpy as np
import pandas as pd

from biomedical_entity_linking_spark.functions.embeddings import (
    cosine_batch,
    embed_batch,
    embed_text,
)


def test_deterministic():
    a = embed_text("hello world")
    b = embed_text("hello world")
    assert np.array_equal(a, b)


def test_unit_norm():
    v = embed_text("some page body text")
    assert math.isclose(float(np.linalg.norm(v)), 1.0, rel_tol=1e-5)


def test_empty_is_zero():
    assert not embed_text("").any()


def test_token_overlap_drives_cosine():
    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"
    far = "one two three four five six seven eight"
    eb, en, ef = embed_text(base), embed_text(near), embed_text(far)
    cos_near = float(np.dot(eb, en))
    cos_far = float(np.dot(eb, ef))
    assert cos_near > 0.8
    assert cos_far < 0.5


def test_case_insensitive():
    assert np.array_equal(embed_text("Alpha Beta"), embed_text("alpha beta"))


def test_cosine_batch():
    a = pd.Series([list(embed_text("x y z")), list(embed_text("a b"))])
    b = pd.Series([list(embed_text("x y z")), list(embed_text("c d"))])
    out = cosine_batch(a, b)
    assert math.isclose(out[0], 1.0, rel_tol=1e-6)
    assert out[1] < 0.9


def test_embed_batch_matches_scalar():
    texts = pd.Series(["alpha beta", "", None, "gamma"])
    got = embed_batch(texts)
    assert np.allclose(got[0], embed_text("alpha beta"), atol=1e-6)
    assert not any(got[1])
    assert not any(got[2])
