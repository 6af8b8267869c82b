"""String similarity kernels: Jaro-Winkler and token-set Levenshtein.

Reference semantics: pairwise mention/alias similarity scoring used by the
candidate generators (cosine over char-3gram tf-idf,
``bioel/bioel/models/scispacy/candidate_generation.py:238-253``; dense inner
product, ``bioel/bioel/models/sapbert/model/model_wrapper.py:72-133``). The
web graft's north rule names Jaro-Winkler + token-set Levenshtein as the
pairwise string metrics; both are implemented here as batch kernels consumed
from a single Arrow ``pandas_udf`` (see ``operators/scoring.py``).

The inner per-pair loops are plain Python over already-materialized numpy/
pandas batches — this is the Arrow-vectorized slow path (the reference's
analog is its C++/Cython kernels). At production scale these two kernels are
the only candidates for a native library swap; everything around them is pure
DataFrame algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched chars in order
    t = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted by up to 4 chars of common prefix."""
    j = jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1.0 - j)
    return j


def levenshtein(s1: str, s2: str) -> int:
    """Edit distance, O(min(len)*max(len)) with a rolling row."""
    if s1 == s2:
        return 0
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, start=1):
        cur = [i] + [0] * len(s2)
        for j, c2 in enumerate(s2, start=1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2))
        prev = cur
    return prev[-1]


def _token_set(s: str) -> list[str]:
    return sorted(set(s.split()))


def token_set_levenshtein_ratio(s1: str, s2: str) -> float:
    """Token-set Levenshtein ratio in [0, 1].

    Tokenize on whitespace, dedup + sort tokens (order-insensitive — the
    analog of the reference's set-union alias dedup,
    ``bioel/bioel/ontology.py:356-369``), rejoin with single spaces, then
    ``1 - lev/max_len``. Robust to token reordering and duplication.
    """
    t1 = " ".join(_token_set(s1))
    t2 = " ".join(_token_set(s2))
    if t1 == t2:
        return 1.0
    m = max(len(t1), len(t2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(t1, t2) / m


def jaro_winkler_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch kernel: elementwise Jaro-Winkler over two string Series.
    Equal strings short-circuit (duplicate titles are the common case in a
    web corpus) and repeated pairs within a batch hit a memo table."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    memo: dict[tuple[str, str], float] = {}
    for i in range(len(av)):
        x, y = av[i], bv[i]
        if x == y:
            out[i] = 1.0
            continue
        key = (x, y) if x < y else (y, x)
        v = memo.get(key)
        if v is None:
            v = jaro_winkler(x, y)
            memo[key] = v
        out[i] = v
    return pd.Series(out)


def token_set_lev_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch kernel: elementwise token-set Levenshtein ratio (memoized,
    equal-string short-circuit)."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    memo: dict[tuple[str, str], float] = {}
    for i in range(len(av)):
        x, y = av[i], bv[i]
        if x == y:
            out[i] = 1.0
            continue
        key = (x, y) if x < y else (y, x)
        v = memo.get(key)
        if v is None:
            v = token_set_levenshtein_ratio(x, y)
            memo[key] = v
        out[i] = v
    return pd.Series(out)
