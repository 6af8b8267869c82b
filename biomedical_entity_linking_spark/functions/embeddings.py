"""Deterministic pooled "sentence embeddings" + cosine kernels.

Reference semantics: dense retrieval pools transformer token embeddings into
one vector per mention/entity and scores with inner product / cosine
(``bioel/bioel/models/sapbert/model/model_wrapper.py:72-133``,
``bioel/bioel/models/krissbert/model/model.py:131-151``). The sandbox has no
model weights, so the embedding function is a *deterministic hash-based*
stand-in: every token maps to a fixed pseudo-random unit-ish vector (seeded
by the token's siphash, expanded via splitmix64) and a text embeds as the
L2-normalized mean of
its token vectors. This preserves exactly the property the pipeline needs —
texts sharing many tokens have high cosine — while being reproducible on any
worker with zero model downloads.

All entry points are batch kernels for Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DIM = 64


def _expand_hash_bytes(h: np.ndarray, dim: int) -> np.ndarray:
    """uint64 seeds (n,) → pseudo-random uint8 matrix (n, dim) via
    vectorized splitmix64 steps — the whole token→bytes derivation is
    numpy array ops (a per-token blake2b loop was ~1.5 s per 500k unique
    tokens; this is ~30 ms)."""
    n = len(h)
    words = (dim + 7) // 8
    out = np.empty((n, words * 8), dtype=np.uint8)
    x = h.astype(np.uint64, copy=True)
    golden = np.uint64(0x9E3779B97F4A7C15)
    m1 = np.uint64(0xBF58476D1CE4E5B9)
    m2 = np.uint64(0x94D049BB133111EB)
    for w in range(words):
        x = x + golden  # uint64 wraparound
        z = x.copy()
        z ^= z >> np.uint64(30)
        z *= m1
        z ^= z >> np.uint64(27)
        z *= m2
        z ^= z >> np.uint64(31)
        out[:, w * 8 : (w + 1) * 8] = (
            np.ascontiguousarray(z[:, None]).view(np.uint8)
        )
    return out[:, :dim]


def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """object array of str → deterministic uint64 per token (pandas
    siphash with its fixed default key — stable across runs/processes).
    pandas' hashtable truncates object keys at NUL bytes; harmless here
    (a pathological NUL token merely aliases two token vectors,
    deterministically — the embedding is a hash stand-in, not a codec)."""
    import pandas as pd

    return pd.util.hash_array(tokens, categorize=False)


def _token_vector(token: str, dim: int = DIM) -> np.ndarray:
    """Fixed pseudo-random vector per token (centered uniform bytes from
    the same hash_array+splitmix64 derivation the bulk path uses)."""
    h = _hash_tokens(np.array([token], dtype=object))
    v = _expand_hash_bytes(h, dim)[0].astype(np.float32)
    return (v - 127.5) / 73.9  # center + scale to unit-ish variance


class TokenVectorCache:
    """Per-executor memoization of token vectors (broadcast-free; tokens are
    re-derived deterministically on every worker)."""

    def __init__(self, dim: int = DIM):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def get(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            v = _token_vector(token, self.dim)
            self._cache[token] = v
        return v


def embed_text(text: str, cache: TokenVectorCache | None = None, dim: int = DIM) -> np.ndarray:
    """Pooled embedding: L2-normalized mean of token vectors (lowercased,
    whitespace-tokenized). Empty text → zero vector (the zero-vector guard
    analog of ``candidate_generation.py:142-159`` drops these upstream)."""
    cache = cache or TokenVectorCache(dim)
    tokens = text.lower().split()
    if not tokens:
        return np.zeros(dim, dtype=np.float32)
    acc = np.zeros(dim, dtype=np.float32)
    for t in tokens:
        acc += cache.get(t)
    n = float(np.linalg.norm(acc))
    if n == 0.0:
        return np.zeros(dim, dtype=np.float32)
    return acc / n


def embed_batch(
    texts: pd.Series,
    dim: int = DIM,
    cache: "BulkTokenCache | None" = None,
    as_numpy: bool = False,
) -> "list[list[float]] | np.ndarray":
    """Batch kernel: Series[str] → list of dim-float lists.

    Fully vectorized: tokenize the whole batch, factorize the token
    stream (C-speed), derive all unique token vectors in one
    hash_array+splitmix64 array pass, then pool per text with per-dim
    bincount segment sums over uint8 gathers. No per-token Python work
    anywhere.
    """
    cache = cache or BulkTokenCache(dim)
    tok_lists = [t.lower().split() for t in texts.fillna("")]
    flat: list[str] = [t for toks in tok_lists for t in toks]
    if not flat:
        empty = np.zeros((len(tok_lists), dim), dtype=np.float64)
        return empty if as_numpy else empty.tolist()
    ids = cache.lookup(flat)
    matrix = cache.matrix  # uint8 (n_uniq, dim): raw digest bytes
    n_texts = len(tok_lists)
    lengths = np.fromiter(
        (len(toks) for toks in tok_lists), dtype=np.int64, count=n_texts
    )
    # segment sum via per-dim bincount over per-dim uint8 gathers — never
    # materializing the (n_tokens, dim) float row matrix (that gather +
    # astype was measured 7.7x slower and ~1 GB/batch at 50k texts).
    # Centering happens afterwards:
    # sum((v-127.5)/73.9) = (sum(v) - 127.5*n) / 73.9
    seg = np.repeat(np.arange(n_texts, dtype=np.int64), lengths)
    dim_n = matrix.shape[1]
    sums = np.empty((n_texts, dim_n), dtype=np.float64)
    for d in range(dim_n):
        sums[:, d] = np.bincount(
            seg, weights=matrix[:, d][ids], minlength=n_texts
        )
    sums = (sums - 127.5 * lengths[:, None]) / 73.9
    norms = np.linalg.norm(sums, axis=1)
    norms[norms == 0] = 1.0
    unit = sums / norms[:, None]
    unit[lengths == 0] = 0.0
    return unit if as_numpy else unit.tolist()


class BulkTokenCache:
    """Batch-local token→row table, rebuilt per ``lookup`` call.

    Deliberately NOT persistent across batches: on Zipf-tail vocabularies a
    growing cache is quadratic in copying (vstack per batch) and unbounded
    in memory, while re-deriving the whole batch's unique vectors is one
    vectorized hash+expand pass — recomputing hot tokens per batch is
    cheaper than caching the tail. ``matrix`` holds only the current
    batch's unique tokens.
    """

    def __init__(self, dim: int = DIM):
        self.dim = dim
        self.matrix = np.zeros((0, dim), dtype=np.float64)

    def lookup(self, tokens: list[str]) -> np.ndarray:
        # pd.factorize is the C-speed uniquifier (a Python dict + fromiter
        # over the token stream was measured ~4s per 7.5M-token batch).
        # pandas' hashtable merges keys at NUL bytes — harmless here: the
        # embedding is a deterministic hash stand-in, so a pathological
        # NUL-token merge just aliases two token vectors, deterministically.
        codes, uniq = pd.factorize(np.asarray(tokens, dtype=object))
        seeds = _hash_tokens(np.asarray(uniq, dtype=object))
        # raw uint8; centering happens after pooling
        self.matrix = _expand_hash_bytes(seeds, self.dim)
        return codes.astype(np.int64, copy=False)


def cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch kernel: elementwise cosine between two array<float> Series.

    Stacks both sides into (N, dim) float64 matrices — one vectorized numpy
    pass per Arrow batch, no per-row Python arithmetic."""
    ma = np.stack([np.asarray(x, dtype=np.float64) for x in a])
    mb = np.stack([np.asarray(x, dtype=np.float64) for x in b])
    num = np.einsum("ij,ij->i", ma, mb)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return pd.Series(out)
