"""VP8L lossless WebP decode: hand-assembled bitstreams.

Every vector here is built BIT BY BIT from the public WebP Lossless
Bitstream Specification (RFC 9649) in this file — no encoder is
shared with the decoder, so a misread of the spec on either side
shows up as a mismatch.  Expected pixels are computed by hand (or
with the spec's arithmetic written out independently in the test).
"""

from __future__ import annotations

import numpy as np
import pytest

from exam_pdf_parser_spark.core.vp8l import (
    decode_vp8l, decode_webp, decode_webp_gray,
)


class W:
    """LSB-first bit writer (the spec's WriteBits)."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, value: int, n: int) -> "W":
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def code(self, code: int, length: int) -> "W":
        """A canonical prefix code, MSB first (the spec's packing)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)
        return self

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            if bit:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def header(w: W, width: int, height: int) -> W:
    w.b(0x2F, 8)
    w.b(width - 1, 14)
    w.b(height - 1, 14)
    w.b(0, 1)          # alpha hint
    w.b(0, 3)          # version
    return w


def single(w: W, sym: int) -> W:
    """Simple prefix code, one symbol (0 data bits per use)."""
    w.b(1, 1)                       # simple
    w.b(0, 1)                       # num_symbols - 1 = 0
    if sym < 2:
        w.b(0, 1)                   # 1-bit symbol
        w.b(sym, 1)
    else:
        w.b(1, 1)                   # 8-bit symbol
        w.b(sym, 8)
    return w


def pair(w: W, s0: int, s1: int) -> W:
    """Simple prefix code, two symbols; canonical ⇒ the SMALLER symbol
    gets bit 0 (callers pass s0 < s1)."""
    assert s0 < s1 <= 255
    w.b(1, 1).b(1, 1)               # simple, two symbols
    w.b(1, 1)                       # 8-bit first symbol
    w.b(s0, 8)
    w.b(s1, 8)
    return w


def test_solid_color_simple_codes():
    w = header(W(), 3, 2)
    w.b(0, 1)                       # no transforms
    w.b(0, 1)                       # no color cache
    w.b(0, 1)                       # no meta prefix
    single(w, 0x42)                 # green
    single(w, 0x10)                 # red
    single(w, 0x20)                 # blue
    single(w, 0xFF)                 # alpha
    single(w, 0)                    # distance
    rgba = decode_vp8l(w.bytes())
    assert rgba.shape == (2, 3, 4)
    assert (rgba == np.array([0x10, 0x42, 0x20, 0xFF])).all()


def test_two_symbol_simple_code_alternation():
    w = header(W(), 4, 1)
    w.b(0, 1).b(0, 1).b(0, 1)
    pair(w, 5, 9)                   # green: 5→bit0, 9→bit1
    single(w, 1)                    # red
    single(w, 2)                    # blue
    single(w, 0xFF)                 # alpha
    single(w, 0)                    # distance
    for bit in (0, 1, 1, 0):        # per-pixel green selections
        w.b(bit, 1)
    rgba = decode_vp8l(w.bytes())
    assert list(rgba[0, :, 1]) == [5, 9, 9, 5]
    assert (rgba[..., 0] == 1).all() and (rgba[..., 2] == 2).all()


def test_lz77_backref_through_distance_map():
    """Green code lengths {0x42:1, 0x99:2, 257:2} via a CLC coding
    symbols {1:1, 2:2, 18:2} (canonical 1→'0', 2→'10', 18→'11');
    data = literal, 2-pixel backref (distance map entry (1,0) →
    distance 1), literal."""
    w2 = header(W(), 4, 1)
    w2.b(0, 1).b(0, 1).b(0, 1)
    w2.b(0, 1)                      # green: not simple
    w2.b(1, 4)                      # 5 CLC lengths: {17,18,0,1,2}
    w2.b(0, 3)                      # len(17)=0
    w2.b(2, 3)                      # len(18)=2
    w2.b(0, 3)                      # len(0)=0
    w2.b(1, 3)                      # len(1)=1
    w2.b(2, 3)                      # len(2)=2
    clc1, clc2, clc18 = (0b0, 1), (0b10, 2), (0b11, 2)
    w2.b(0, 1)                      # max_symbol = full alphabet (280)

    def zeros(n):
        while n:
            run = min(n, 138)
            assert run >= 11
            w2.code(*clc18)
            w2.b(run - 11, 7)
            n -= run

    zeros(0x42)                     # 0..65
    w2.code(*clc1)                  # len 1 @ 0x42
    zeros(0x99 - 0x43)              # 67..152 (86 zeros)
    w2.code(*clc2)                  # len 2 @ 0x99
    zeros(257 - 0x9A)               # 154..256 (103 zeros)
    w2.code(*clc2)                  # len 2 @ 257
    zeros(280 - 258)                # 258..279 (22 zeros)
    # green canonical: 0x42→'0', 0x99→'10', 257→'11'
    single(w2, 7)                   # red
    single(w2, 3)                   # blue
    single(w2, 0xFF)                # alpha
    single(w2, 1)                   # distance: always plane code sym 1
    # data: literal 0x42 | backref len=2 dist=1 | literal 0x99
    w2.code(0b0, 1)                 # literal g=0x42 (r/b/a cost 0 bits)
    w2.code(0b11, 2)                # sym 257 → length prefix 1 → len 2
    # distance symbol read (0 bits, single) → prefix value 2 → map
    # entry (1,0) → dist = 1
    w2.code(0b10, 2)                # literal g=0x99
    rgba = decode_vp8l(w2.bytes())
    assert list(rgba[0, :, 1]) == [0x42, 0x42, 0x42, 0x99]
    assert (rgba[..., 0] == 7).all() and (rgba[..., 2] == 3).all()


def test_color_cache_roundtrip():
    """cache_bits=2: a literal inserts itself, later cache symbols
    reproduce it.  The cache index is the spec hash, computed here
    independently."""
    cache_bits = 2
    argb = (0xFF << 24) | (0x00 << 16) | (0x77 << 8) | 0x00
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    lit, hit = 0x77, 280 + idx
    lo, hi = min(lit, hit), max(lit, hit)

    w = header(W(), 3, 1)
    w.b(0, 1)                       # no transforms
    w.b(1, 1).b(cache_bits, 4)      # color cache on
    w.b(0, 1)                       # no meta
    # green over 284 symbols: {lit:1, hit:1} via CLC {1:1, 2:2, 18:2};
    # the explicit max_symbol path covers the trailing zeros (which
    # can be < 3, below both repeat symbols' floors)
    w.b(0, 1)                       # not simple
    w.b(1, 4)                       # 5 CLC lengths {17,18,0,1,2}
    w.b(0, 3).b(2, 3).b(0, 3).b(1, 3).b(2, 3)
    clc1, clc18 = (0b0, 1), (0b11, 2)
    # 5 CLC symbols follow: one 18-run, '1', two 18-runs, '1'
    w.b(1, 1)                       # use explicit max_symbol
    w.b(0, 3)                       # length_nbits = 2
    w.b(3, 2)                       # max_symbol = 2 + 3 = 5

    def zeros(n):
        while n:
            run = min(n, 138)
            assert run >= 11
            w.code(*clc18)
            w.b(run - 11, 7)
            n -= run

    zeros(lo)                       # 119 zeros (one run)
    w.code(*clc1)
    zeros(hi - lo - 1)              # 160+idx zeros (two runs)
    w.code(*clc1)                   # trailing zeros: implicit
    # canonical: lo→'0', hi→'1'
    glit = (0b0, 1) if lit == lo else (0b1, 1)
    ghit = (0b1, 1) if lit == lo else (0b0, 1)
    single(w, 0x00)                 # red
    single(w, 0x00)                 # blue
    single(w, 0xFF)                 # alpha
    single(w, 0)                    # distance
    w.code(*glit)                   # pixel 0: literal
    w.code(*ghit)                   # pixel 1: cache hit
    w.code(*ghit)                   # pixel 2: cache hit
    rgba = decode_vp8l(w.bytes())
    assert (rgba == np.array([0, 0x77, 0, 0xFF])).all()


def test_subtract_green_inverse():
    w = header(W(), 2, 1)
    w.b(1, 1).b(2, 2)               # transform: subtract green
    w.b(0, 1)                       # end transforms
    w.b(0, 1).b(0, 1)               # no cache, no meta
    single(w, 100)                  # green
    single(w, 30)                   # red residual
    single(w, 200)                  # blue residual
    single(w, 0xFF)                 # alpha
    single(w, 0)
    rgba = decode_vp8l(w.bytes())
    # r = (30+100) & 255 = 130 ; b = (200+100) & 255 = 44
    assert (rgba == np.array([130, 100, 44, 255])).all()


def test_color_indexing_with_pixel_bundling():
    """2-entry palette → 1-bit indices, 8 pixels packed per green
    byte; the palette itself is delta-coded."""
    w = header(W(), 8, 1)
    w.b(1, 1).b(3, 2)               # transform: color indexing
    w.b(2 - 1, 8)                   # palette size 2
    # palette sub-image, 2×1 (entropy-coded image, not level0):
    w.b(0, 1)                       # no cache
    pair(w, 0, 20)                  # green: e0=0, Δg=20
    pair(w, 0, 10)                  # red:   e0=0, Δr=10
    pair(w, 0, 30)                  # blue:  e0=0, Δb=30
    pair(w, 0, 0xFF)                # alpha: e0=0xFF, Δa=0
    single(w, 0)                    # distance
    # entry 0: g·r·b codes '0', alpha 0xFF → code '1'
    w.b(0, 1).b(0, 1).b(0, 1).b(1, 1)
    # entry 1 (delta): g=20→'1', r=10→'1', b=30→'1', a=0→'0'
    w.b(1, 1).b(1, 1).b(1, 1).b(0, 1)
    w.b(0, 1)                       # end transforms
    # main image: packed width 1 (8 px / byte at 1 bit each)
    w.b(0, 1).b(0, 1)               # no cache, no meta
    single(w, 0xB2)                 # green byte = 0b10110010 (indices)
    single(w, 0)                    # red
    single(w, 0)                    # blue
    single(w, 0)                    # alpha
    single(w, 0)                    # distance
    rgba = decode_vp8l(w.bytes())
    e0 = np.array([0, 0, 0, 0xFF])
    e1 = np.array([10, 20, 30, 0xFF])   # delta-decoded: e0 + Δ
    bits = [(0xB2 >> i) & 1 for i in range(8)]   # LSB-first unbundle
    want = np.stack([e1 if b else e0 for b in bits])
    assert (rgba[0] == want).all()


def test_predictor_transform_modes():
    """2×2 image, one 4×4 block, predictor mode 2 (T).  Edge rules:
    (0,0)→opaque black, top row→L, left column→T."""
    w = header(W(), 2, 2)
    w.b(1, 1).b(0, 2)               # transform: predictor
    w.b(0, 3)                       # size_bits = 2 → 4×4 blocks → 1×1
    # mode sub-image (1×1): green = mode 2
    w.b(0, 1)                       # no cache
    single(w, 2)                    # green = predictor mode
    single(w, 0)
    single(w, 0)
    single(w, 0)
    single(w, 0)
    w.b(0, 1)                       # end transforms
    w.b(0, 1).b(0, 1)               # no cache, no meta
    # residuals: all four channels from two-symbol codes {1, 2}
    pair(w, 1, 2)                   # green
    pair(w, 1, 2)                   # red
    pair(w, 1, 2)                   # blue
    pair(w, 1, 2)                   # alpha
    single(w, 0)
    # residual pixels (g, r, b, a) selections — bit 0 → 1, bit 1 → 2:
    res = [(1, 1, 1, 1), (2, 2, 2, 2), (1, 2, 1, 2), (2, 1, 2, 1)]
    for g, r, b, a in res:
        w.b(g - 1, 1)               # green first,
        w.b(r - 1, 1)               # then red,
        w.b(b - 1, 1)               # then blue,
        w.b(a - 1, 1)               # then alpha (spec literal order)
    rgba = decode_vp8l(w.bytes())

    # independent spec arithmetic: out = residual + prediction (mod
    # 256 per channel); residuals re-expressed from the stream's
    # (g, r, b, a) tuples into the array's RGBA order
    def add(p, q):
        return tuple((x + y) & 0xFF for x, y in zip(p, q))

    def rgba_of(g, r, b, a):
        return (r, g, b, a)

    p00 = add(rgba_of(*res[0]), (0, 0, 0, 0xFF))    # opaque black
    p10 = add(rgba_of(*res[1]), p00)                # top row → L
    p01 = add(rgba_of(*res[2]), p00)                # left col → T
    p11 = add(rgba_of(*res[3]), p10)                # mode 2 → T
    # residual order in `res` is row-major (p00, p10, p01, p11)
    assert tuple(rgba[0, 0]) == p00
    assert tuple(rgba[0, 1]) == p10
    assert tuple(rgba[1, 0]) == p01
    assert tuple(rgba[1, 1]) == p11


def test_color_transform_inverse():
    w = header(W(), 2, 1)
    w.b(1, 1).b(1, 2)               # transform: cross-color
    w.b(0, 3)                       # size_bits = 2 → 1×1 blocks
    # cte sub-image: green_to_red lives in the BLUE channel = 5
    w.b(0, 1)
    single(w, 0)                    # green (green_to_blue = 0)
    single(w, 0)                    # red (red_to_blue = 0)
    single(w, 5)                    # blue (green_to_red = 5)
    single(w, 0)                    # alpha
    single(w, 0)
    w.b(0, 1)                       # end transforms
    w.b(0, 1).b(0, 1)
    single(w, 64)                   # green
    single(w, 10)                   # red residual
    single(w, 7)                    # blue residual
    single(w, 0xFF)                 # alpha
    single(w, 0)
    rgba = decode_vp8l(w.bytes())
    # delta = (int8(5) * int8(64)) >> 5 = 10 → r = 10 + 10 = 20
    assert (rgba == np.array([20, 64, 7, 255])).all()


def test_webp_container_and_gray():
    import struct

    w = header(W(), 3, 2)
    w.b(0, 1).b(0, 1).b(0, 1)
    single(w, 90)                   # green
    single(w, 30)                   # red
    single(w, 60)                   # blue
    single(w, 0xFF)
    single(w, 0)
    chunk = w.bytes()
    payload = (b"RIFF" + struct.pack("<I", 12 + 8 + len(chunk))
               + b"WEBP" + b"VP8L" + struct.pack("<I", len(chunk))
               + chunk)
    rgba = decode_webp(payload)
    assert rgba.shape == (2, 3, 4)
    gray = decode_webp_gray(payload)
    assert gray.shape == (2, 3)
    assert (gray == (30 + 90 + 60) // 3).all()

    # lossy VP8 stays a loud stub
    lossy = (b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8 "
             + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(lossy)

    # the operator-level image decode routes WebP here now
    from exam_pdf_parser_spark.operators.multimodal import decode_image

    assert (decode_image(payload) == (30 + 90 + 60) // 3).all()


def test_fuzz_never_hangs_or_fabricates():
    """Byte flips and truncations raise ValueError (or decode to a
    valid image by luck) — never hang or crash with another type."""
    vecs = []
    w = header(W(), 3, 2)
    w.b(0, 1).b(0, 1).b(0, 1)
    for s in (0x42, 0x10, 0x20, 0xFF, 0):
        single(w, s)
    vecs.append(w.bytes())

    rng = np.random.default_rng(17)
    for blob in vecs:
        for _ in range(64):
            b = bytearray(blob)
            for _ in range(3):
                b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
            try:
                decode_vp8l(bytes(b))
            except ValueError:
                pass
            try:
                decode_vp8l(bytes(b[: rng.integers(1, len(b))]))
            except ValueError:
                pass
