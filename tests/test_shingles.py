"""MinHash determinism + Jaccard estimation accuracy (FIXTURES.md §6)."""

import numpy as np

from biomedical_entity_linking_spark.functions.shingles import (
    MinHasher,
    band_keys,
    char_shingles,
    shingle_hashes,
)


def test_char_shingles_word_boundary_padding():
    s = char_shingles("ab cd", n=3)
    # char_wb flavor: space padding generates boundary shingles
    assert " ab" in s and "cd " in s


def test_empty_and_whitespace():
    assert char_shingles("", 3) == set()
    assert char_shingles("   ", 3) == set()


def test_shingle_hashes_deterministic():
    h1 = shingle_hashes("hello world")
    h2 = shingle_hashes("hello world")
    assert sorted(h1) == sorted(h2)
    assert all(int(x) < (1 << 31) for x in h1)


def test_signature_deterministic_across_instances():
    m1 = MinHasher(num_perm=64)
    m2 = MinHasher(num_perm=64)
    s1 = m1.signature_for("the quick brown fox")
    s2 = m2.signature_for("the quick brown fox")
    assert np.array_equal(s1, s2)


def test_jaccard_estimation():
    """MinHash signature agreement ≈ true Jaccard of shingle sets."""
    m = MinHasher(num_perm=256)
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumps over the lazy cat"
    sa, sb = char_shingles(a), char_shingles(b)
    true_j = len(sa & sb) / len(sa | sb)
    siga, sigb = m.signature_for(a), m.signature_for(b)
    est_j = float(np.mean(siga == sigb))
    assert abs(est_j - true_j) < 0.12  # 256 perms → stderr ~ sqrt(j(1-j)/256) ≈ 0.03


def test_identical_strings_identical_signatures():
    m = MinHasher(num_perm=128)
    assert np.array_equal(m.signature_for("abc def"), m.signature_for("abc def"))


def test_band_keys_structure():
    m = MinHasher(num_perm=128)
    sig = [int(v) for v in m.signature_for("some title")]
    keys = band_keys(sig, bands=32, rows=4)
    assert len(keys) == 32
    assert all(0 <= k < (1 << 63) for k in keys)
    # same signature → same keys; different band index → (a.s.) different keys
    assert keys == band_keys(sig, bands=32, rows=4)
    assert len(set(keys)) > 16


def test_banding_collision_behavior():
    """Highly similar strings share ≥1 band key; dissimilar strings share none."""
    m = MinHasher(num_perm=128)
    near_a = [int(v) for v in m.signature_for("distributed entity resolution pipeline")]
    near_b = [int(v) for v in m.signature_for("distributed entity resolution pipelines")]
    far = [int(v) for v in m.signature_for("completely unrelated text about cooking")]
    ka = set(band_keys(near_a, 32, 4))
    kb = set(band_keys(near_b, 32, 4))
    kf = set(band_keys(far, 32, 4))
    assert ka & kb
    assert not (ka & kf)
