"""Real-crawl jpeg stub-rate probe (VERDICT r4 #6).

A real web crawl's jpeg population is NOT all baseline-interleaved: a
large share is progressive (most big images on the modern web), with a
tail of 4:2:2 baseline. The engine's posture — built-in from-scratch
codec for sequential AND progressive (4:4:4 / 4:2:0 / grayscale),
Pillow as the optional executor dependency for the residue, stub-row
fallback past both — implies a deployment-dependent REAL-decode
fraction. This probe measures it instead of leaving it prose:
synthesize a mixed-variant corpus with a crawl-shaped mix, run the
actual ``image_features`` operator, and report the per-variant
real/stub dispatch fractions in one JSON line.

All six real-file variants are REAL files from the built-in encoders
(baseline 4:4:4/4:2:0/4:2:2/grayscale and restart-interval framing via
``encode_jpeg``, progressive via ``encode_jpeg_progressive``), and —
round 5 — ALL of them decode with the built-in codec: full SOF2
progressive landed, then h2v1 (4:2:2), then DRI/RSTn restart
intervals. A seventh variant, ``arithmetic`` (SOF patched to 0xC9),
represents the remaining out-of-scope tail (arithmetic coding /
16-bit / hierarchical): the dispatch decision happens at header-parse
time, so the patched file exercises exactly the Pillow-or-stub routing
a true arithmetic file would. ``tests/test_multimodal.py`` pins the
same routing exactly.

Mix (share of jpeg payloads, coarse web-crawl shape):
  baseline 4:2:0  35%   | decodes built-in
  baseline 4:4:4  12%   | decodes built-in
  baseline gray    5%   | decodes built-in
  progressive     43%   | decodes built-in (round 5: full SOF2 decode)
  baseline 4:2:2   3%   | decodes built-in (round 5: h2v1 layout)
  restart DRI      1%   | decodes built-in (round 5: RSTn handling)
  arithmetic       1%   | Pillow-or-stub (declared out-of-scope tail)

Usage: ``python tools/jpeg_stubrate_probe.py [n_images]`` (default 400).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

MIX = [
    ("baseline_420", 0.35),
    ("baseline_444", 0.12),
    ("baseline_gray", 0.05),
    ("progressive", 0.43),
    ("baseline_422", 0.03),
    ("restart_dri", 0.01),
    ("arithmetic", 0.01),
]


def _test_image(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(h + w - 2, 1)),
        ],
        axis=2,
    ).astype(np.int16)
    img = img + rng.randint(-12, 13, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _patch_arithmetic(payload: bytes) -> bytes:
    """SOF0 → SOF9 (arithmetic sequential). The entropy stream is not a
    valid arithmetic stream, but the dispatch decision — the thing
    measured — happens when the decoder parses the SOF marker, exactly
    as for a true arithmetic-coded file."""
    i = payload.find(b"\xff\xc0")
    assert i >= 0
    return payload[:i] + b"\xff\xc9" + payload[i + 2 :]


def make_variant(which: str, rng: np.random.RandomState) -> bytes:
    from biomedical_entity_linking_spark.functions.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    h = int(rng.randint(16, 49))
    w = int(rng.randint(16, 49))
    img = _test_image(rng, h, w)
    if which == "baseline_444":
        return encode_jpeg(img)
    if which == "baseline_420":
        return encode_jpeg(img, subsample=True)
    if which == "baseline_gray":
        return encode_jpeg(img.mean(axis=2).astype(np.uint8))
    if which == "progressive":
        return encode_jpeg_progressive(img, subsample=True)
    if which == "baseline_422":
        return encode_jpeg(img, subsample="422")
    if which == "restart_dri":
        return encode_jpeg(img, subsample=True, restart_interval=4)
    if which == "arithmetic":
        return _patch_arithmetic(encode_jpeg(img))
    raise ValueError(which)


def build_corpus(n: int, seed: int = 11) -> list[tuple[int, str, bytes]]:
    rng = np.random.RandomState(seed)
    rows = []
    bounds = np.cumsum([f for _, f in MIX])
    for i in range(n):
        u = (i + 0.5) / n  # deterministic stratified draw over the mix
        which = MIX[int(np.searchsorted(bounds, u))][0]
        rows.append((i, which, make_variant(which, rng)))
    return rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    from pyspark.sql import functions as F

    from biomedical_entity_linking_spark.operators.multimodal import (
        _pil,
        image_features,
    )
    from biomedical_entity_linking_spark.session import get_spark

    spark = get_spark(app_name="jpeg-stubrate", cores=8)
    corpus = build_corpus(n)
    media = spark.createDataFrame(
        [(mid, "image", payload) for mid, _, payload in corpus],
        "media_id long, kind string, payload binary",
    )
    variants = spark.createDataFrame(
        [(mid, which) for mid, which, _ in corpus],
        "media_id long, variant string",
    )
    feats = image_features(media)
    per = (
        feats.join(variants, "media_id")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.count("width").alias("real"),  # stub fallback → null row
        )
        .orderBy("variant")
        .collect()
    )
    table = {
        r["variant"]: {
            "n": r["n"],
            "real": r["real"],
            "real_frac": round(r["real"] / r["n"], 4),
        }
        for r in per
    }
    total = sum(v["n"] for v in table.values())
    real = sum(v["real"] for v in table.values())
    print(
        json.dumps(
            {
                "probe": "jpeg_stubrate",
                "n_images": total,
                "pillow_present": _pil() is not None,
                "real_frac": round(real / total, 4),
                "stub_frac": round(1 - real / total, 4),
                "by_variant": table,
            }
        )
    )


if __name__ == "__main__":
    main()
