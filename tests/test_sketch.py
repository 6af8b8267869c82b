"""HLL register sketch: the three properties that make it a sketch.

1. Construction parity — the Spark relational construction equals a
   trusted pure-Python mirror of the same md5/bucket/rho math (the
   driver oracle additionally hashes it against DuckDB).
2. Mergeability — element-wise max over any partitioning of the input
   equals the whole-corpus sketch (the property that makes the state
   shippable across shards/days at 100 TB).
3. Estimate accuracy — the standard HLL bound (~1.04/sqrt(256) ≈ 6.5%
   relative std error) holds at a cardinality far above the registers.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from biomedical_entity_linking_spark.operators import sketch as SK


def _py_registers(tokens):
    """Trusted mirror: same md5-60-bit construction in pure Python."""
    reg = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        bucket = h % SK.HLL_M
        suffix = h // SK.HLL_M
        rho = SK._SUFFIX_BITS - suffix.bit_length() + 1
        if rho > reg.get(bucket, 0):
            reg[bucket] = rho
    return reg


def test_spark_construction_matches_python_mirror(spark, tmp_path):
    toks = [f"tok{i}" for i in range(2000)] + ["tok0", "tok1"]  # dups absorbed
    df = spark.createDataFrame(
        [("web", " ".join(toks[:1200])), ("web", " ".join(toks[1200:])),
         ("news", " ".join(toks[::3]))],
        "source string, text string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["source"], r["bucket"]): r["max_rho"]
        for r in SK.vocab_hll_registers(spark, str(tmp_path)).collect()
    }
    want = {}
    for src, sl in [("web", toks), ("news", toks[::3])]:
        for b, rho in _py_registers(sl).items():
            want[(src, b)] = rho
    assert got == want


def test_merge_of_any_partitioning_equals_whole():
    toks = [f"w{i}" for i in range(30_000)]
    whole = _py_registers(toks)
    # three overlapping shards (overlap exercises idempotence)
    parts = [toks[:12_000], toks[10_000:22_000], toks[20_000:]]
    merged = SK.merge_registers(*[_py_registers(p) for p in parts])
    assert merged == whole
    # idempotent + commutative
    assert SK.merge_registers(whole, whole) == whole
    assert SK.merge_registers(*reversed([_py_registers(p) for p in parts])) == whole


@pytest.mark.parametrize("n", [500, 50_000])
def test_estimate_within_hll_error_bound(n):
    reg = _py_registers([f"item-{i}" for i in range(n)])
    est = SK.hll_estimate(reg)
    # 1.04/sqrt(256) ≈ 6.5% std error; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_empty_and_tiny_registers():
    assert SK.hll_estimate({}) == 0.0  # all-zero registers → linear count 0
    reg = _py_registers(["only-one"])
    est = SK.hll_estimate(reg)
    assert 0 < est < 10  # linear-counting regime


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def _py_cms(tokens):
    """Trusted mirror: same salted-md5 construction in pure Python."""
    sk = {}
    for t in tokens:
        for j, b in enumerate(SK._cms_buckets(t)):
            sk[(j, b)] = sk.get((j, b), 0) + 1
    return sk


def test_cms_spark_construction_matches_python_mirror(spark, tmp_path):
    toks = [f"tok{i % 300}" for i in range(3000)]  # real frequencies
    df = spark.createDataFrame(
        [("web", " ".join(toks[:1700])), ("web", " ".join(toks[1700:]))],
        "source string, text string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in SK.token_cms_registers(spark, str(tmp_path)).collect()
    }
    assert got == _py_cms(toks)


def test_cms_merge_of_any_partitioning_equals_whole():
    toks = [f"w{i % 5000}" for i in range(40_000)]
    whole = _py_cms(toks)
    parts = [toks[:9_000], toks[9_000:25_000], toks[25_000:]]
    assert SK.cms_merge(*[_py_cms(p) for p in parts]) == whole
    assert (
        SK.cms_merge(*reversed([_py_cms(p) for p in parts])) == whole
    )  # commutative


def test_cms_never_underestimates_and_bounds_heavy_hitters():
    import collections

    # Zipf-ish stream: token k appears ~30000/(k+1) times
    stream = [f"z{k}" for k in range(200) for _ in range(30_000 // (k + 1))]
    true = collections.Counter(stream)
    sk = _py_cms(stream)
    n = len(stream)
    over_bound = 2 * n / SK.CMS_W  # CMS guarantee w.p. 1 - 2^-d
    violations = 0
    for tok, cnt in true.items():
        est = SK.cms_estimate(sk, tok)
        assert est >= cnt  # NEVER underestimates (structural)
        if est - cnt > over_bound:
            violations += 1
    assert violations <= max(1, len(true) // 16)  # 1-2^-4 confidence
    # the heavy head is near-exact: relative error < 5% on top 10
    for k in range(10):
        tok = f"z{k}"
        assert SK.cms_estimate(sk, tok) - true[tok] < 0.05 * true[tok]


def test_cms_absent_token_reads_small():
    sk = _py_cms([f"x{i}" for i in range(1000)])
    # an unseen token's estimate is bounded by collision mass, tiny here
    assert SK.cms_estimate(sk, "never-seen-token") <= 10


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _py_bloom(tokens):
    bits = set()
    for t in tokens:
        bits.update(SK._bloom_bits(t))
    return bits


def test_bloom_spark_construction_matches_python_mirror(spark, tmp_path):
    bench_toks = [f"ev{i}" for i in range(500)]
    corpus_toks = [f"tr{i}" for i in range(500)]
    df = spark.createDataFrame(
        [(10, "web", " ".join(bench_toks)),   # doc_id % 10 == 0: benchmark
         (11, "web", " ".join(corpus_toks))],  # corpus: excluded
        "doc_id long, source string, text string",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["source"], r["bit"])
        for r in SK.benchmark_bloom_bits(spark, str(tmp_path)).collect()
    }
    assert got == {("web", b) for b in _py_bloom(bench_toks)}


def test_bloom_no_false_negatives_and_fp_rate():
    import math

    members = [f"m{i}" for i in range(800)]
    bits = _py_bloom(members)
    for m in members:
        assert SK.bloom_contains(bits, m)  # structural: no false negatives
    probes = [f"q{i}" for i in range(20_000)]
    fp = sum(1 for p in probes if SK.bloom_contains(bits, p))
    expected = (1 - math.exp(-SK.BLOOM_K * len(members) / SK.BLOOM_M)) ** SK.BLOOM_K
    assert fp / len(probes) < 3 * expected + 0.01


def test_bloom_merge_of_any_partitioning_equals_whole():
    toks = [f"t{i}" for i in range(3000)]
    whole = _py_bloom(toks)
    parts = [toks[:1000], toks[800:2200], toks[2000:]]
    assert SK.bloom_merge(*[_py_bloom(p) for p in parts]) == whole
    assert SK.bloom_merge(whole, set()) == whole  # empty identity


# ---------------------------------------------------------------------------
# Log-binned histogram (quantile sketch)
# ---------------------------------------------------------------------------


def _py_hist(values):
    import bisect

    h = {}
    for v in values:
        b = bisect.bisect_right(SK.HIST_EDGES, v) - 1  # -1 when v < 1
        h[b] = h.get(b, 0) + 1
    return h


def test_hist_edges_grow_by_at_most_eps():
    for a, b in zip(SK.HIST_EDGES, SK.HIST_EDGES[1:]):
        assert b <= max(a + 1, (a * SK.HIST_EPS_NUM) // SK.HIST_EPS_DEN)
        assert b > a


def test_hist_merge_equals_whole():
    import random

    rng = random.Random(7)
    vals = [rng.randrange(1, 10**6) for _ in range(20_000)]
    whole = _py_hist(vals)
    parts = [vals[:5000], vals[5000:12_000], vals[12_000:]]
    assert SK.hist_merge(*[_py_hist(p) for p in parts]) == whole


def test_hist_quantile_within_one_bin_of_exact():
    import random

    rng = random.Random(13)
    vals = sorted(rng.randrange(1, 10**6) for _ in range(50_000))
    h = _py_hist(vals)
    n = len(vals)
    for q_num, q_den in [(1, 2), (9, 10), (99, 100)]:
        exact = vals[(q_num * n + q_den - 1) // q_den - 1]  # discrete pctl
        est = SK.hist_quantile(h, q_num, q_den)
        # estimate = lower edge of the exact value's bin: within eps
        assert est <= exact
        assert exact < max(est + 1, (est * SK.HIST_EPS_NUM) // SK.HIST_EPS_DEN)


def test_hist_spark_construction_matches_python_mirror(spark, tmp_path):
    vals = [1, 5, 17, 100, 1000, 12345, 999_999, 3, 3, 3]
    df = spark.createDataFrame(
        [("web", v) for v in vals], "source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["bin"]: r["cnt"]
        for r in SK.length_histogram(spark, str(tmp_path)).collect()
    }
    assert got == _py_hist(vals)
