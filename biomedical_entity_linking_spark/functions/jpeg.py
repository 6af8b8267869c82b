"""JPEG codec — pure numpy + stdlib, written from the public ITU-T
T.81 spec (Annex F sequential, Annex G progressive, Annex K tables).

Scope: what a crawl-pipeline FALLBACK needs when Pillow is absent from
the executor image — 8-bit Huffman DCT, sequential (SOF0/SOF1,
single- or multi-scan) AND progressive (SOF2: spectral selection +
successive approximation, cross-scan EOB runs, DC/AC refinement);
4:4:4, 4:2:0 (the dominant real-world layout; h2v2 MCUs, chroma at
half resolution), 4:2:2 (h2v1, the camera/editor tail) or grayscale.
Restart intervals (DRI/RSTn — the camera-JPEG framing) are handled in
every scan kind. Out of scope: 16-bit precision, arithmetic coding,
hierarchical/lossless modes, rarer layouts (4:1:1 …) — these raise
``NotImplementedError`` with an actionable message and the pluggable registry prefers Pillow
when it IS importable (``multimodal.decode_image``). A progressive
stream cut at a scan boundary still decodes (coarse, as a browser
renders a partial download); a cut inside a scan raises.

The encoders exist so the decoder is testable hermetically: encode →
decode roundtrips must reconstruct within quantization error (PSNR
gate in ``tests/test_multimodal.py``), and — the stronger check —
``decode(encode_jpeg(img))`` and ``decode(encode_jpeg_progressive(img))``
must be BIT-IDENTICAL, since both orderings carry the same quantized
coefficients through independent entropy codings. The framing/tables
follow the spec, so standard decoders read the output (not verifiable
in this container; the roundtrips plus spec-sourced constants are the
evidence).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# (BITS counts per code length 1..16, HUFFVAL symbol list) — K.3.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, derived (not transcribed): walk
    anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk bottom-left → top-right
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()  # flat-index order: natural[ZIGZAG[k]] = k-th coeff
_UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II basis: D = C @ B @ C.T, B = C.T @ D @ C
_C = np.array([
    [(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
     * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8)]
    for k in range(8)
])


# --------------------------------------------------------------------------
# Huffman table construction (canonical codes from BITS/HUFFVAL — C.2)
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {
        (length, code): sym for sym, (code, length) in _build_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn — raw marker, never byte-stuffed."""
        self.flush()
        self.bytes += bytes([0xFF, 0xD0 + (n % 8)])


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError("jpeg: unexpected marker in scan")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, n: int) -> None:
        """Discard padding bits, consume the expected RSTn marker."""
        self._n = 0  # byte-align: drop the segment's 1-fill padding
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n % 8)
        ):
            raise ValueError("jpeg: missing/out-of-order restart marker")
        self.pos += 2


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size`-bit magnitude to signed value."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    """Bit-size category of a signed value (0 for 0)."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    dc_pred: int,
) -> int:
    coeffs = _C @ block @ _C.T
    q = np.round(coeffs / quant).astype(np.int64)
    zz = q.ravel()[ZIGZAG]
    # DC
    diff = int(zz[0]) - dc_pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _marker(tag: int, body: bytes = b"") -> bytes:
    if body:
        return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body
    return bytes([0xFF, tag])


def _pad_replicate(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]  # edge replicate
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _prepare_planes(
    img: np.ndarray, subsample: bool | str
) -> tuple[bool, int, int, list, list, int, int]:
    """Shared encoder front half: color convert, level shift, subsample,
    MCU-pad. Returns (gray, h, w, padded_planes, samps, mcux, mcuy).

    ``subsample``: False → 4:4:4, True/"420" → 4:2:0 (chroma halved both
    ways, 2×2 mean), "422" → 4:2:2 (chroma halved horizontally, h2v1)."""
    mode = {False: None, True: "420", "420": "420", "422": "422"}[subsample]
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("jpeg: empty image")
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        if mode == "420":
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            halved = []
            for p in planes[1:]:
                pe = _pad_replicate(p, he, we)
                halved.append(
                    pe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
                )
            planes = [planes[0]] + halved
            samps = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            we = (w + 1) // 2 * 2
            halved = []
            for p in planes[1:]:
                pe = _pad_replicate(p, h, we)
                halved.append(pe.reshape(h, we // 2, 2).mean(axis=2))
            planes = [planes[0]] + halved
            samps = [(2, 1), (1, 1), (1, 1)]
        else:
            samps = [(1, 1)] * 3

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_replicate(p, mcuy * 8 * vi, mcux * 8 * hi)
        for p, (hi, vi) in zip(planes, samps)
    ]
    return gray, h, w, padded, samps, mcux, mcuy


def encode_jpeg(
    img: np.ndarray,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes.
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker (with
    DC-predictor reset + byte alignment) every that-many MCUs — the
    camera-JPEG framing.

    ``subsample=True``/``"420"`` emits 4:2:0 (h2v2 luma, chroma at half
    resolution via 2×2 mean) — the dominant real-world layout;
    ``"422"`` emits h2v1 (chroma halved horizontally) — the camera/
    editor tail — so both subsampled decode paths are hermetically
    testable."""
    gray, h, w, padded, samps, mcux, mcuy = _prepare_planes(img, subsample)

    out = bytearray()
    out += _marker(0xD8)  # SOI
    out += _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00"
    )
    out += _marker(0xDB, bytes([0]) + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _marker(
            0xDB, bytes([1]) + bytes(QUANT_CHROMA.ravel()[ZIGZAG].astype(np.uint8))
        )
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _marker(0xC0, sof)
    for tclass, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ) + (() if gray else (
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )):
        out += _marker(0xC4, bytes([(tclass << 4) | tid] + bits + vals))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0] * ncomp
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            unit = my * mcux + mx
            if restart_interval and unit and unit % restart_interval == 0:
                writer.restart(rst_n)
                rst_n += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samps[ci]
                quant = QUANT_LUMA if ci == 0 else QUANT_CHROMA
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        block = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                        preds[ci] = _encode_block(
                            writer, block, quant, dc, ac, preds[ci]
                        )
    writer.flush()
    out += writer.bytes
    out += _marker(0xD9)  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (spectral selection + successive approximation)
# --------------------------------------------------------------------------

# Progressive AC scans need EOBn symbols (run-length codes 0x00..0xE0 for
# end-of-band runs up to 2^15-1 blocks, T.81 G.1.2.2) which the Annex K
# sequential AC tables don't define — so the progressive encoder ships its
# own AC table: every symbol it can emit at a flat 8-bit code length
# (160 run/size pairs + ZRL + 15 EOBn = 176 ≤ 256; canonical, all-ones
# code unused). Flat codes cost compression, not correctness — fixtures,
# not production encoding, are this encoder's job.
AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = (
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [r << 4 for r in range(15)]
)

_MAX_EOBRUN = 0x7FFF  # largest run one EOBn symbol covers (r=14 + 14 bits)


def _progression_script(ncomp: int) -> list[tuple[list[int], int, int, int, int]]:
    """(comp_indices, Ss, Se, Ah, Al) per scan — the shape of libjpeg's
    simple progression: DC first at Al=1 interleaved, AC first passes per
    component at Al=1, then one refinement sweep of everything to Al=0.
    Exercises all four scan kinds (DC/AC × first/refine), spectral
    splitting, and cross-scan EOB runs."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 1),
            ([0], 6, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 1),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def _quantize_all(padded: list, gray: bool) -> list[np.ndarray]:
    """Padded planes → per-component (bh, bw, 64) zigzag-ordered quantized
    coefficients.

    Per-block ``_C @ block @ _C.T`` — the EXPRESSION ``_encode_block``
    uses, deliberately not a batched einsum: a different float summation
    order can flip a coefficient sitting exactly on a rounding boundary
    by one step, and the progressive-vs-baseline bit-identity contract
    requires both encoders to quantize identically."""
    out = []
    for ci, p in enumerate(padded):
        quant = QUANT_LUMA if ci == 0 else QUANT_CHROMA
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        q = np.empty((bh, bw, 64), dtype=np.int64)
        for r in range(bh):
            for c in range(bw):
                block = p[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
                coeffs = _C @ block @ _C.T
                q[r, c] = np.round(coeffs / quant).astype(np.int64).ravel()[ZIGZAG]
        out.append(q)
    return out


def _block_order(
    scan_idx: list[int], samps: list, h: int, w: int, mcux: int, mcuy: int
):
    """Yield (comp_index, block_row, block_col) in scan order: MCU-
    interleaved when the scan covers >1 component, the component's OWN
    (non-MCU-padded) block raster when it covers one (T.81 A.2)."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    if len(scan_idx) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in scan_idx:
                    hi, vi = samps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            yield my * mcux + mx, ci, my * vi + by, mx * hi + bx
    else:
        ci = scan_idx[0]
        hi, vi = samps[ci]
        bw = (-(-w * hi // hmax) + 7) // 8
        bh = (-(-h * vi // vmax) + 7) // 8
        for r in range(bh):
            for c in range(bw):
                yield r * bw + c, ci, r, c


def _enc_dc_scan(
    writer: _BitWriter,
    order,
    coefs: list[np.ndarray],
    ah: int,
    al: int,
    dc_codes: list[dict],
    ri: int = 0,
) -> None:
    preds: dict[int, int] = {}
    rst_n = 0
    last_unit = -1
    for unit, ci, r, c in order:
        if ri and unit != last_unit and unit and unit % ri == 0:
            writer.restart(rst_n)
            rst_n += 1
            preds = {}
        last_unit = unit
        v = int(coefs[ci][r, c, 0])
        if ah == 0:  # first pass: code diffs of the point transform
            t = v >> al  # DC point transform is an ARITHMETIC shift
            diff = t - preds.get(ci, 0)
            preds[ci] = t
            size = _category(diff)
            code, length = dc_codes[ci][size]
            writer.write(code, length)
            if size:
                writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        else:  # refinement: one raw bit per block
            writer.write((v >> al) & 1, 1)


def _enc_ac_first(
    writer: _BitWriter,
    order,
    coefs: list[np.ndarray],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
    ri: int = 0,
) -> None:
    eobrun = 0
    rst_n = 0
    last_unit = -1

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, length = ac_codes[rbits << 4]
            writer.write(code, length)
            if rbits:
                writer.write(eobrun - (1 << rbits), rbits)
            eobrun = 0

    for unit, ci, r, c in order:
        if ri and unit != last_unit and unit and unit % ri == 0:
            flush_eob()
            writer.restart(rst_n)
            rst_n += 1
        last_unit = unit
        band = coefs[ci][r, c, ss : se + 1]
        run = 0
        for v in band:
            v = int(v)
            t = (v >> al) if v >= 0 else -((-v) >> al)  # magnitude shift
            if t == 0:
                run += 1
                continue
            flush_eob()
            while run > 15:
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                run -= 16
            size = _category(t)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(t if t >= 0 else t + (1 << size) - 1, size)
            run = 0
        if run > 0:  # block ends in zeros → it joins an end-of-band run
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush_eob()
    flush_eob()


def _enc_ac_refine(
    writer: _BitWriter,
    order,
    coefs: list[np.ndarray],
    ss: int,
    se: int,
    al: int,
    ac_codes: dict,
    ri: int = 0,
) -> None:
    """T.81 G.1.2.3 AC successive-approximation refinement: newly-
    significant coefficients as run/1 symbols with a sign bit, correction
    bits for already-significant ones buffered and flushed after the next
    emitted symbol (or with the pending EOB run)."""
    eobrun = 0
    rst_n = 0
    last_unit = -1
    eob_bits: list[int] = []  # corrections owned by the pending EOB run
    cur_bits: list[int] = []  # corrections since the last emitted symbol

    def flush_cur() -> None:
        for b in cur_bits:
            writer.write(b, 1)
        cur_bits.clear()

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            rbits = eobrun.bit_length() - 1
            code, length = ac_codes[rbits << 4]
            writer.write(code, length)
            if rbits:
                writer.write(eobrun - (1 << rbits), rbits)
            for b in eob_bits:
                writer.write(b, 1)
            eob_bits.clear()
            eobrun = 0

    for unit, ci, r, c in order:
        if ri and unit != last_unit and unit and unit % ri == 0:
            flush_eob()
            writer.restart(rst_n)
            rst_n += 1
        last_unit = unit
        band = [int(v) for v in coefs[ci][r, c, ss : se + 1]]
        t = [abs(v) >> al for v in band]
        # EOB position: past the last NEWLY-significant coefficient,
        # trailing corrections fold into the EOB run (libjpeg-identical)
        eobpos = -1
        for k, tv in enumerate(t):
            if tv == 1:
                eobpos = k
        run = 0
        for k, tv in enumerate(t):
            if tv == 0:
                run += 1
                continue
            while run > 15 and k <= eobpos:
                flush_eob()
                code, length = ac_codes[0xF0]
                writer.write(code, length)
                run -= 16
                flush_cur()
            if tv > 1:
                cur_bits.append(tv & 1)
                continue
            flush_eob()
            code, length = ac_codes[(run << 4) | 1]
            writer.write(code, length)
            writer.write(1 if band[k] > 0 else 0, 1)
            flush_cur()
            run = 0
        if run > 0 or cur_bits:
            eobrun += 1
            eob_bits.extend(cur_bits)
            cur_bits.clear()
            if eobrun == _MAX_EOBRUN:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → PROGRESSIVE (SOF2) JFIF
    bytes, libjpeg-style progression script (DC-first interleaved at
    Al=1, per-component spectral AC passes, full refinement sweep to
    Al=0). Same quantizer and sampling as :func:`encode_jpeg`, so the
    decoded result must be BIT-IDENTICAL to decoding the baseline
    encoding of the same image — the cross-check the tests pin."""
    gray, h, w, padded, samps, mcux, mcuy = _prepare_planes(img, subsample)
    coefs = _quantize_all(padded, gray)
    ncomp = len(coefs)

    out = bytearray()
    out += _marker(0xD8)
    out += _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + (1).to_bytes(2, "big") * 2 + b"\x00\x00"
    )
    out += _marker(0xDB, bytes([0]) + bytes(QUANT_LUMA.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _marker(
            0xDB, bytes([1]) + bytes(QUANT_CHROMA.ravel()[ZIGZAG].astype(np.uint8))
        )
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += _marker(0xC2, sof)  # SOF2: progressive DCT, Huffman
    for tclass, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_PROG_BITS, AC_PROG_VALS),
    ) + (() if gray else ((0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),)):
        out += _marker(0xC4, bytes([(tclass << 4) | tid] + bits + vals))

    dc_codes = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        if ci == 0
        else _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    ac_codes = _build_codes(AC_PROG_BITS, AC_PROG_VALS)

    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    for scan_idx, ss, se, ah, al in _progression_script(ncomp):
        sos = bytes([len(scan_idx)])
        for ci in scan_idx:
            dc_id = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dc_id << 4) | 0])  # AC table 0 shared
        sos += bytes([ss, se, (ah << 4) | al])
        out += _marker(0xDA, sos)
        writer = _BitWriter()
        order = _block_order(scan_idx, samps, h, w, mcux, mcuy)
        ri = restart_interval
        if ss == 0:
            _enc_dc_scan(writer, order, coefs, ah, al, dc_codes, ri)
        elif ah == 0:
            _enc_ac_first(writer, order, coefs, ss, se, al, ac_codes, ri)
        else:
            _enc_ac_refine(writer, order, coefs, ss, se, al, ac_codes, ri)
        writer.flush()
        out += writer.bytes
    out += _marker(0xD9)
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes → uint8 RGB (h, w, 3); grayscale replicates.

    Handles baseline (SOF0), extended sequential (SOF1, identical at
    8-bit precision) and PROGRESSIVE (SOF2: spectral selection +
    successive approximation, T.81 Annex G) — including multi-scan
    sequential files (each scan a component subset). All scans decode
    into per-component coefficient arrays; dequantization + IDCT run
    once, vectorized over every block, after the last scan.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    coefs: dict[int, np.ndarray] = {}
    geom: dict[int, tuple] = {}
    scanned: set[int] = set()
    mcux = mcuy = hmax = vmax = 0
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: bad marker framing")
        tag = payload[pos + 1]
        if tag == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        pos += 2
        if tag == 0xD9:  # EOI
            break
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:
            continue  # parameterless
        length = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + length]
        pos += length
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tbl = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                if tbl.size != 64:
                    raise ValueError("jpeg: truncated DQT segment")
                natural = np.empty(64, dtype=np.int32)
                natural[ZIGZAG] = tbl
                quant[tid] = natural.reshape(8, 8)
                i += 65
        elif tag == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("jpeg: truncated DHT segment")
                tclass, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("jpeg: truncated DHT segment")
                (huff_ac if tclass else huff_dc)[tid] = _build_decoder(bits, vals)
                i += 17 + n
        elif tag in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if frame is not None:
                raise ValueError("jpeg: multiple SOF markers")
            progressive = tag == 0xC2
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, qid = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            layouts = {tuple((hi, vi) for _, hi, vi, _ in comps)}
            if layouts - {((1, 1),), ((1, 1), (1, 1), (1, 1)),
                          ((2, 2), (1, 1), (1, 1)),
                          ((2, 1), (1, 1), (1, 1))}:
                raise NotImplementedError(
                    "jpeg: only 4:4:4, 4:2:2, 4:2:0 and grayscale in the "
                    "built-in codec — install Pillow for other layouts "
                    "(4:1:1 etc.)"
                )
            frame = (h, w, comps)
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hi, vi, _ in comps:
                # storage on the MCU-padded grid; non-interleaved scans
                # touch only the component's own ceil(samples/8) subgrid
                bw = (-(-w * hi // hmax) + 7) // 8
                bh = (-(-h * vi // vmax) + 7) // 8
                coefs[cid] = np.zeros(
                    (mcuy * vi, mcux * hi, 64), dtype=np.int32
                )
                geom[cid] = (hi, vi, bh, bw)
        elif tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only Huffman sequential/progressive DCT (SOF0/1/2) "
                "in the built-in codec"
            )
        elif tag == 0xDD:  # DRI: restart interval in MCUs (0 = none)
            restart_interval = int.from_bytes(body[:2], "big")
        elif tag == 0xDA:  # SOS: decode one scan's entropy data
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tids = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
                scanned.add(cid)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_scan(
                payload, pos, scan_comps, ss, se, ah, al, progressive,
                coefs, geom, huff_dc, huff_ac, mcux, mcuy,
                restart_interval,
            )
    if frame is None or not scanned:
        raise ValueError("jpeg: missing SOF/SOS")
    h, w, comps = frame
    missing = {cid for cid, _, _, _ in comps} - scanned
    if missing:
        raise ValueError(f"jpeg: components without scan data: {missing}")

    # dequantize + IDCT, vectorized across all blocks of each component
    planes = {}
    for cid, _, _, qid in comps:
        zz = coefs[cid]
        bh, bw = zz.shape[0], zz.shape[1]
        natural = np.empty((bh, bw, 64), dtype=np.float64)
        natural[..., ZIGZAG] = zz
        deq = natural.reshape(bh, bw, 8, 8) * quant[qid]
        blocks = np.einsum("ab,xybc,cd->xyad", _C.T, deq, _C)
        planes[cid] = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)

    samps = {cid: (hi, vi) for cid, hi, vi, _ in comps}

    def _full_res(cid: int) -> np.ndarray:
        """Crop to content, upsample to (h, w) by pixel replication."""
        hi, vi = samps[cid]
        p = planes[cid]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        return p[:h, :w]

    cids = [cid for cid, _, _, _ in comps]
    if len(comps) == 1:
        y = np.clip(_full_res(cids[0]) + 128.0, 0, 255)
        return np.repeat(y.astype(np.uint8)[:, :, None], 3, axis=2)
    y = _full_res(cids[0]) + 128.0
    # chroma planes were level-shifted by -128 at encode; the YCbCr→RGB
    # formula wants (Cb - 128), so the stored plane IS the centered value
    cb = _full_res(cids[1])
    cr = _full_res(cids[2])
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _scan_order(scan_comps, geom, mcux, mcuy):
    """(mcu_unit, cid, dc_id, ac_id, block_row, block_col) in scan order —
    MCU-interleaved for multi-component scans, the component's own block
    raster for single-component scans where the MCU is one block
    (T.81 A.2). The unit index is what restart intervals count."""
    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = my * mcux + mx
                for cid, dc_id, ac_id in scan_comps:
                    hi, vi = geom[cid][0], geom[cid][1]
                    for by in range(vi):
                        for bx in range(hi):
                            yield (
                                unit, cid, dc_id, ac_id,
                                my * vi + by, mx * hi + bx,
                            )
    else:
        cid, dc_id, ac_id = scan_comps[0]
        bh, bw = geom[cid][2], geom[cid][3]
        for r in range(bh):
            for c in range(bw):
                yield r * bw + c, cid, dc_id, ac_id, r, c


def _decode_scan(
    data: bytes,
    pos: int,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    progressive: bool,
    coefs,
    geom,
    huff_dc,
    huff_ac,
    mcux: int,
    mcuy: int,
    ri: int = 0,
) -> int:
    """Decode one scan's entropy data into the coefficient arrays;
    return the byte offset of the next marker. ``ri`` = restart
    interval in MCUs (0 = none): at each boundary the reader
    byte-aligns, consumes the expected RSTn, and the branch resets its
    cross-MCU state (DC predictors / EOB run)."""
    reader = _BitReader(data, pos)
    order = _scan_order(scan_comps, geom, mcux, mcuy)
    rst_n = 0
    last_unit = -1
    if progressive and not (
        (ss == 0 and se == 0) or (0 < ss <= se <= 63 and len(scan_comps) == 1)
    ):
        raise ValueError("jpeg: illegal progressive scan parameters")
    if not progressive and not (ss == 0 and se == 63 and ah == 0 and al == 0):
        raise ValueError("jpeg: illegal sequential scan parameters")

    if ss == 0 and (se == 0 or not progressive):
        if ah == 0:  # DC first (or full sequential scan)
            preds: dict[int, int] = {}
            for unit, cid, dc_id, ac_id, r, c in order:
                if ri and unit != last_unit and unit and unit % ri == 0:
                    reader.restart(rst_n)
                    rst_n += 1
                    preds = {}
                last_unit = unit
                blk = coefs[cid][r, c]
                size = _read_symbol(reader, huff_dc[dc_id])
                diff = _extend(reader.read_bits(size), size) if size else 0
                preds[cid] = preds.get(cid, 0) + diff
                blk[0] = preds[cid] << al
                if not progressive:  # sequential: AC follows in-block
                    k = 1
                    while k <= se:
                        sym = _read_symbol(reader, huff_ac[ac_id])
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        run, sz = sym >> 4, sym & 0xF
                        k += run
                        if k > se:
                            raise ValueError("jpeg: AC index overflow")
                        blk[k] = _extend(reader.read_bits(sz), sz)
                        k += 1
        else:  # DC refinement: one raw bit per block
            for unit, cid, _dc_id, _ac_id, r, c in order:
                if ri and unit != last_unit and unit and unit % ri == 0:
                    reader.restart(rst_n)
                    rst_n += 1
                last_unit = unit
                if reader.read_bit():
                    coefs[cid][r, c, 0] |= 1 << al
    elif ah == 0:  # AC first pass (progressive, single component)
        eobrun = 0
        for unit, cid, _dc_id, ac_id, r, c in order:
            if ri and unit != last_unit and unit and unit % ri == 0:
                reader.restart(rst_n)
                rst_n += 1
                eobrun = 0
            last_unit = unit
            blk = coefs[cid][r, c]
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _read_symbol(reader, huff_ac[ac_id])
                run, sz = sym >> 4, sym & 0xF
                if sz == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.read_bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("jpeg: AC index overflow")
                blk[k] = _extend(reader.read_bits(sz), sz) << al
                k += 1
    else:  # AC refinement (T.81 G.2.2 / libjpeg decode_mcu_AC_refine)
        p1, m1 = 1 << al, -(1 << al)
        eobrun = 0
        for unit, cid, _dc_id, ac_id, r, c in order:
            if ri and unit != last_unit and unit and unit % ri == 0:
                reader.restart(rst_n)
                rst_n += 1
                eobrun = 0
            last_unit = unit
            blk = coefs[cid][r, c]
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _read_symbol(reader, huff_ac[ac_id])
                    run, sz = sym >> 4, sym & 0xF
                    val = 0
                    if sz == 0:
                        if run != 15:  # EOBn: run covers this block too
                            eobrun = 1 << run
                            if run:
                                eobrun += reader.read_bits(run)
                            break
                        # ZRL: skip 16 zero-history positions
                    else:
                        if sz != 1:
                            raise ValueError("jpeg: bad AC-refine size")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if blk[k] != 0:
                            if reader.read_bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] > 0 else m1
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if eobrun > 0:
                # correction bits for the rest of the band, then for every
                # block the run covers
                while k <= se:
                    if blk[k] != 0 and reader.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                    k += 1
                eobrun -= 1

    # scan entropy data ends at the next marker (fill 0xFFs belong to it)
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] not in (0x00,)
    ):
        p += 1
    return p


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")
