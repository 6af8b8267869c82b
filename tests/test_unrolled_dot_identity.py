"""Focused test for the r6 embedding_neardup hot-loop rewrite
(OPTIMIZATION_r06.md): the unrolled 64-term sum ``((0.0+p1)+p2)+...``
must perform the IDENTICAL IEEE-754 operation sequence as the
``aggregate``/``zip_with`` left fold it replaced — bit-identical doubles,
not approximately-equal ones — because the query's cosine threshold and
the DuckDB oracle hash are exact. Exercised on adversarial magnitudes
(mixed signs, exponents spanning 1e-30..1e30) where any reassociation
WOULD change the result."""

import random
import struct

from pyspark.sql import functions as F

_DIM = 64


def _hof_dot():
    return F.aggregate(
        F.zip_with(F.col("pv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _unrolled_dot():
    out = F.lit(0.0)
    for i in range(1, _DIM + 1):
        out = out + (F.element_at(F.col("pv"), i) * F.element_at(F.col("v"), i))
    return out


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def test_unrolled_matches_hof_bitwise(spark):
    rng = random.Random(1234)

    def vec():
        return [
            rng.choice([-1.0, 1.0]) * rng.random() * 10 ** rng.randint(-30, 30)
            for _ in range(_DIM)
        ]

    rows = [(vec(), vec()) for _ in range(200)]
    df = spark.createDataFrame(
        rows, "pv array<double>, v array<double>"
    ).select(_hof_dot().alias("h"), _unrolled_dot().alias("u"))
    for r in df.collect():
        assert _bits(r["h"]) == _bits(r["u"]), (r["h"], r["u"])
