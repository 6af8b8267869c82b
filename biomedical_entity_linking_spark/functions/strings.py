"""String similarity kernels: Jaro-Winkler and token-set Levenshtein.

Reference semantics: pairwise mention/alias similarity scoring used by the
candidate generators (cosine over char-3gram tf-idf,
``bioel/bioel/models/scispacy/candidate_generation.py:238-253``; dense inner
product, ``bioel/bioel/models/sapbert/model/model_wrapper.py:72-133``). The
web graft's north rule names Jaro-Winkler + token-set Levenshtein as the
pairwise string metrics; both are implemented here as batch kernels consumed
from a single Arrow ``pandas_udf`` (see ``operators/scoring.py``).

Execution shape (no per-row Python in the hot path):

1. equal-string pairs short-circuit to 1.0 (duplicate titles are the common
   case in a web corpus);
2. the rest are canonical-ordered and uniquified (the vectorized form of the
   old memo table — each distinct pair is scored once per batch);
3. unique pairs are encoded as padded uint32 codepoint matrices and scored
   by numpy DP kernels vectorized ACROSS THE PAIR AXIS: the Levenshtein
   row-recurrence runs its sequential prefix-min as
   ``np.minimum.accumulate``; the Jaro greedy window matching loops only
   over character positions, with the per-pair window scan, flag updates,
   and transposition count all as array ops.

The scalar reference implementations are kept below for the property tests
(and as documentation of the exact semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# scalar reference implementations (test oracles)
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# vectorized kernels
# ---------------------------------------------------------------------------


def _encode(strs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """object array of str → (padded uint32 codepoint matrix, lengths)."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    # pad with an impossible codepoint — 0 would collide with real U+0000
    M = np.full((n, max(L, 1)), 0xFFFFFFFF, dtype=np.uint32)
    for i, s in enumerate(strs):  # one pass over UNIQUE strings only
        if s:
            # surrogatepass: lone surrogates are representable in utf-32,
            # so the kernel is total over Python strs (Arrow-validated
            # UTF-8 never produces them, but direct pandas callers can)
            M[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le", errors="surrogatepass"), dtype=np.uint32
            )
    return M, lens


def _lev_core(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Levenshtein distances for N pairs at once. The inner-row dependency
    cur[j] = min(m[j-1], cur[j-1]+1) is a prefix-min in disguise:
    cur[j] = min_{k<=j}(h[k]) + j with h[0]=i, h[k]=m[k-1]-k — one
    ``np.minimum.accumulate`` per DP row, vectorized across pairs."""
    N, _ = A.shape
    L1 = int(la.max()) if N else 0
    L2 = B.shape[1]
    ar = np.arange(L2 + 1, dtype=np.int32)
    prev = np.tile(ar, (N, 1))
    res = lb.astype(np.int32).copy()  # correct for pairs with la == 0
    rows = np.arange(N)
    for i in range(1, L1 + 1):
        ci = A[:, i - 1][:, None]
        m = np.minimum(prev[:, :-1] + (B != ci), prev[:, 1:] + 1)
        h = np.concatenate(
            [np.full((N, 1), i, dtype=np.int32), (m - ar[1:][None, :]).astype(np.int32)],
            axis=1,
        )
        cur = np.minimum.accumulate(h, axis=1) + ar[None, :]
        done = la == i
        if done.any():
            res[done] = cur[rows[done], lb[done]]
        prev = cur
    return res


def _jaro_core(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Jaro similarity for N pairs at once: the greedy window matching
    loops over s1 character positions; window masking, first-available-j
    selection, flag updates, and the transposition count are array ops."""
    N, L1m = A.shape
    L2 = B.shape[1]
    L1 = int(la.max()) if N else 0
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    flags2 = np.zeros((N, L2), dtype=bool)
    match_j = np.full((N, L1m), -1, dtype=np.int64)
    jidx = np.arange(L2)[None, :]
    rows = np.arange(N)
    for i in range(L1):
        active = i < la
        lo = (i - w)[:, None]
        hi = np.minimum(lb, i + w + 1)[:, None]
        cand = (
            (B == A[:, i][:, None])
            & ~flags2
            & (jidx >= lo)
            & (jidx < hi)
            & active[:, None]
        )
        hit = cand.any(axis=1)
        j_star = cand.argmax(axis=1)  # first True per row
        match_j[rows[hit], i] = j_star[hit]
        flags2[rows[hit], j_star[hit]] = True
    mask = match_j >= 0
    m = mask.sum(axis=1)
    # matched s1 chars compacted left in i order
    order = np.argsort(~mask, axis=1, kind="stable")
    s1c = np.take_along_axis(A, order, axis=1)
    # matched s2 chars in j order
    js = np.where(mask, match_j, np.iinfo(np.int64).max)
    js_sorted = np.sort(js, axis=1)
    s2c = np.take_along_axis(
        B, np.clip(js_sorted, 0, L2 - 1), axis=1
    )
    posmask = np.arange(L1m)[None, :] < m[:, None]
    t = (((s1c != s2c) & posmask).sum(axis=1) // 2).astype(np.float64)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (
            mf / np.maximum(la, 1)
            + mf / np.maximum(lb, 1)
            + (mf - t) / np.maximum(mf, 1)
        ) / 3.0
    sim[m == 0] = 0.0
    sim[(la == 0) | (lb == 0)] = 0.0
    return sim


def _jaro_winkler_core(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray,
    prefix_weight: float = 0.1,
) -> np.ndarray:
    j = _jaro_core(A, la, B, lb)
    k = min(4, A.shape[1], B.shape[1])
    eq = A[:, :k] == B[:, :k]
    # positions beyond either string's length never count as prefix
    # (padding is 0 on both sides, but only within-length matches are real)
    valid = (np.arange(k)[None, :] < la[:, None]) & (
        np.arange(k)[None, :] < lb[:, None]
    )
    prefix = np.cumprod(eq & valid, axis=1).sum(axis=1)
    boost = j > 0.7
    j[boost] += prefix[boost] * prefix_weight * (1.0 - j[boost])
    return j


def _unique_pairs(
    a: pd.Series, b: pd.Series
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Canonical-order + uniquify (the vectorized memo): returns
    (codes, uniq_lo, uniq_hi, equal_mask)."""
    av = a.fillna("").to_numpy(dtype=object)
    bv = b.fillna("").to_numpy(dtype=object)
    equal = av == bv
    # plain dict uniquifier: pandas factorize/MultiIndex hash C-strings and
    # truncate at NUL chars, silently merging distinct keys — a Python dict
    # is NUL-safe and costs one hash per row (the DP kernels dominate)
    seen: dict[tuple[str, str], int] = {}
    codes = np.empty(len(av), dtype=np.int64)
    ulo_l: list[str] = []
    uhi_l: list[str] = []
    for i in range(len(av)):
        x, y = av[i], bv[i]
        if equal[i]:
            # equal pairs short-circuit to 1.0 downstream — never register
            # them in the unique work set (duplicate titles are the common
            # case; without this each distinct duplicate still paid the
            # O(len^2) DP kernel before being overwritten)
            codes[i] = -1
            continue
        key = (x, y) if x <= y else (y, x)
        c = seen.get(key)
        if c is None:
            c = len(ulo_l)
            seen[key] = c
            ulo_l.append(key[0])
            uhi_l.append(key[1])
        codes[i] = c
    ulo = np.array(ulo_l, dtype=object) if ulo_l else np.array([], dtype=object)
    uhi = np.array(uhi_l, dtype=object) if uhi_l else np.array([], dtype=object)
    return codes, ulo, uhi, equal


_CHUNK = 8192


def _chunked(lo: np.ndarray, hi: np.ndarray, core) -> np.ndarray:
    """Run a pair kernel over length-sorted chunks so each chunk's DP
    matrices pad only to the chunk-local max length (long-tail titles
    would otherwise widen every row)."""
    mx = np.fromiter(
        (max(len(x), len(y)) for x, y in zip(lo, hi)),
        dtype=np.int64,
        count=len(lo),
    )
    order = np.argsort(mx, kind="stable")
    out = np.empty(len(lo), dtype=np.float64)
    for s in range(0, len(order), _CHUNK):
        idx = order[s : s + _CHUNK]
        A, la = _encode(lo[idx])
        B, lb = _encode(hi[idx])
        out[idx] = core(A, la, B, lb)
    return out


def jaro_winkler_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch kernel: elementwise Jaro-Winkler, vectorized over unique
    non-equal pairs (equal strings short-circuit to 1.0)."""
    codes, ulo, uhi, equal = _unique_pairs(a, b)
    out = np.ones(len(codes), dtype=np.float64)  # equal pairs stay 1.0
    if len(ulo):
        uvals = _chunked(ulo, uhi, _jaro_winkler_core)
        ne = ~equal
        out[ne] = uvals[codes[ne]]
    return pd.Series(out)


def token_set_lev_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch kernel: elementwise token-set Levenshtein ratio. Token-set
    normalization runs once per unique string; the edit distance runs
    vectorized over unique normalized pairs."""
    codes, ulo, uhi, equal = _unique_pairs(a, b)
    out = np.ones(len(codes), dtype=np.float64)  # equal pairs stay 1.0
    if len(ulo):
        # normalize once per unique STRING (not per pair)
        all_strs, inv = np.unique(
            np.concatenate([ulo, uhi]), return_inverse=True
        )
        norm = np.array(
            [" ".join(_token_set(s)) for s in all_strs], dtype=object
        )
        nlo = norm[inv[: len(ulo)]]
        nhi = norm[inv[len(ulo):]]

        def ratio_core(A, la, B, lb):
            dist = _lev_core(A, la, B, lb).astype(np.float64)
            mx = np.maximum(la, lb).astype(np.float64)
            return np.where(mx > 0, 1.0 - dist / np.maximum(mx, 1.0), 1.0)

        uvals = _chunked(nlo, nhi, ratio_core)
        uvals = np.where(nlo == nhi, 1.0, uvals)
        ne = ~equal
        out[ne] = uvals[codes[ne]]
    return pd.Series(out)
