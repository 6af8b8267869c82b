"""Deterministic pooled "sentence embeddings" + cosine kernels.

Reference semantics: dense retrieval pools transformer token embeddings into
one vector per mention/entity and scores with inner product / cosine
(``bioel/bioel/models/sapbert/model/model_wrapper.py:72-133``,
``bioel/bioel/models/krissbert/model/model.py:131-151``). The sandbox has no
model weights, so the embedding function is a *deterministic hash-based*
stand-in: every token maps to a fixed pseudo-random unit-ish vector (seeded
by the token's blake2b digest) and a text embeds as the L2-normalized mean of
its token vectors. This preserves exactly the property the pipeline needs —
texts sharing many tokens have high cosine — while being reproducible on any
worker with zero model downloads.

All entry points are batch kernels for Arrow pandas UDFs.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pandas as pd

DIM = 64


def _token_vector(token: str, dim: int = DIM) -> np.ndarray:
    """Fixed pseudo-random vector per token, derived directly from blake2b
    digest bytes (centered uniform). ~30x faster than seeding a RandomState
    per token — which dominates embedding cost on Zipf-tail vocabularies
    where most tokens are cache misses."""
    raw = blake2b(token.encode("utf-8"), digest_size=min(dim, 64)).digest()
    v = np.frombuffer(raw, dtype=np.uint8)
    if dim > 64:  # tile (matches BulkTokenCache's bulk path)
        v = np.tile(v, (dim + 63) // 64)[:dim]
    v = v.astype(np.float32)
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

    Fully vectorized: tokenize the whole batch, bulk-derive vectors for
    unseen tokens (one frombuffer over concatenated digests), then one
    ``np.add.reduceat`` over the gathered rows for per-text pooling. The
    per-token Python cost collapses to a dict lookup + blake2b digest;
    pass a persistent ``BulkTokenCache`` (iterator-UDF state) to reuse hot
    tokens across Arrow batches.
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
    in memory, while re-deriving a token vector is one blake2b digest
    (~0.3 µs) — recomputing hot tokens per batch is cheaper than caching
    the tail. ``matrix`` holds only the current batch's unique tokens.
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
        dsize = min(self.dim, 64)
        digests = b"".join(
            blake2b(t.encode("utf-8"), digest_size=dsize).digest() for t in uniq
        )
        if self.dim <= 64:
            block = np.frombuffer(digests, dtype=np.uint8).reshape(
                len(uniq), self.dim
            )
        else:  # rare big-dim path: tile extra digests
            base = np.frombuffer(digests, dtype=np.uint8).reshape(len(uniq), 64)
            reps = (self.dim + 63) // 64
            block = np.tile(base, (1, reps))[:, : self.dim]
        self.matrix = block  # raw uint8; centering happens after pooling
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
