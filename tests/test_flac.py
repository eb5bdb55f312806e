"""FLAC decode: hand-assembled bitstreams.

Every vector is built BIT BY BIT from the public FLAC format spec
(RFC 9639) in this file — the only codec machinery shared with the
decoder is nothing: the test carries its own MSB-first writer, its
own zigzag/Rice encoder, and its own CRC implementations (different
construction, same polynomials), so a spec misread on either side
surfaces as a mismatch.  Expected samples are literals or arithmetic
written out from the spec's predictor definitions, not calls into
``core/flac.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from exam_pdf_parser_spark.core.flac import (
    decode_flac, encode_flac, parse_streaminfo,
)


class W:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def b(self, value: int, n: int) -> "W":
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def s(self, value: int, n: int) -> "W":
        return self.b(value & ((1 << n) - 1), n)

    def rice(self, v: int, param: int) -> "W":
        u = (v << 1) if v >= 0 else (-(v << 1) - 1)   # zigzag
        q = u >> param
        for _ in range(q):
            self.bits.append(0)
        self.bits.append(1)
        if param:
            self.b(u & ((1 << param) - 1), param)
        return self

    def align(self) -> "W":
        while len(self.bits) % 8:
            self.bits.append(0)
        return self

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray(len(self.bits) // 8)
        for i, bit in enumerate(self.bits):
            if bit:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


def _crc8(data: bytes) -> int:
    """Table-driven CRC-8/0x07 (different construction from the
    decoder's bitwise loop)."""
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) if c & 0x80 else (c << 1)
        table.append(c & 0xFF)
    crc = 0
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    table = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) if c & 0x8000 else (c << 1)
        table.append(c & 0xFFFF)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ table[(crc >> 8) ^ b]
    return crc


def streaminfo(rate: int, channels: int, bits: int, total: int,
               blocksize: int = 16) -> bytes:
    w = W()
    w.b(blocksize, 16).b(blocksize, 16)       # min/max blocksize
    w.b(0, 24).b(0, 24)                       # min/max framesize
    w.b(rate, 20).b(channels - 1, 3).b(bits - 1, 5)
    w.b(total, 36)
    body = w.bytes() + b"\x00" * 16           # md5 unset
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big")
            + body)


def frame(subframes, blocksize: int, ch_code: int,
          frame_no: int = 0) -> bytes:
    """Assemble one fixed-blocksize frame: header (+CRC-8), the given
    subframe bit-writer callbacks, padding, CRC-16.  Blocksize uses
    the 8-bit end-of-header form so any size works."""
    w = W()
    w.b(0x3FFE, 14).b(0, 1).b(0, 1)
    w.b(6, 4)                                 # blocksize-1 follows, 8b
    w.b(0, 4)                                 # rate from STREAMINFO
    w.b(ch_code, 4)
    w.b(0, 3).b(0, 1)                         # size from STREAMINFO
    w.b(frame_no, 8)                          # coded number < 0x80
    w.b(blocksize - 1, 8)
    hdr = w.bytes()
    hdr += bytes([_crc8(hdr)])
    w = W()
    for sub in subframes:
        sub(w)
    w.align()
    body = hdr + w.bytes()
    return body + _crc16(body).to_bytes(2, "big")


def sub_constant(value: int, bps: int):
    return lambda w: w.b(0, 1).b(0, 6).b(0, 1).s(value, bps)


def sub_verbatim(samples, bps: int):
    def write(w):
        w.b(0, 1).b(1, 6).b(0, 1)
        for v in samples:
            w.s(v, bps)
    return write


def test_constant_and_verbatim_mono():
    """CONSTANT repeats one signed value; VERBATIM stores raw."""
    blob = (streaminfo(8000, 1, 8, 10)
            + frame([sub_constant(-5, 8)], 4, 0, 0)
            + frame([sub_verbatim([1, -2, 3, -4, 5, 127], 8)], 6, 0, 1))
    samples, rate = decode_flac(blob)
    assert rate == 8000
    want = [-5, -5, -5, -5, 1, -2, 3, -4, 5, 127]
    assert np.allclose(samples, np.array(want) / 128.0)


def test_fixed_order2_rice_residual():
    """FIXED order-2 prediction: s[n] = 2 s[n-1] - s[n-2] + r[n].
    Residuals hand-zigzag-Rice-coded with parameter 2; the expected
    outputs are literals."""
    # choose outputs, derive residuals from the SPEC's formula here:
    s = [3, 5, 8, 13, 20, 30, 41, 55]
    res = [s[n] - (2 * s[n - 1] - s[n - 2]) for n in range(2, len(s))]
    assert res == [1, 2, 2, 3, 1, 3]          # literal sanity pin

    def sub(w):
        w.b(0, 1).b(8 + 2, 6).b(0, 1)         # FIXED order 2
        w.s(3, 8).s(5, 8)                     # warmup
        w.b(0, 2)                             # 4-bit Rice method
        w.b(0, 4)                             # partition order 0
        w.b(2, 4)                             # rice parameter 2
        for r in res:
            w.rice(r, 2)

    blob = streaminfo(8000, 1, 8, 8) + frame([sub], 8, 0)
    samples, _ = decode_flac(blob)
    assert [round(v * 128) for v in samples] == s


def test_lpc_subframe():
    """LPC order 1, coefficient 3, shift 1: s[n] = ((3 s[n-1]) >> 1)
    + r[n], arithmetic shift per the spec."""
    warm = 10
    res = [2, -1, 4]
    s = [warm]
    for r in res:                             # spec formula, literal
        s.append(((3 * s[-1]) >> 1) + r)
    assert s == [10, 17, 24, 40]

    def sub(w):
        w.b(0, 1).b(32 + 0, 6).b(0, 1)        # LPC order 1
        w.s(warm, 8)                          # warmup
        w.b(4 - 1, 4)                         # precision 4 bits
        w.s(1, 5)                             # shift 1
        w.s(3, 4)                             # coefficient 3
        w.b(0, 2).b(0, 4)                     # 4-bit Rice, po=0
        w.b(3, 4)                             # param 3
        for r in res:
            w.rice(r, 3)

    blob = streaminfo(8000, 1, 8, 4) + frame([sub], 4, 0)
    samples, _ = decode_flac(blob)
    assert [round(v * 128) for v in samples] == s


def test_stereo_decorrelation_modes():
    """left/side, right/side and mid/side all reconstruct the same
    planted (left, right) pair; decode_flac averages to mono."""
    left, right = [10, 11, -6, 3], [4, 5, -8, 3]
    side = [x - y for x, y in zip(left, right)]      # spec: l - r
    mid = [(x + y) >> 1 for x, y in zip(left, right)]
    mono = [(x + y) / 2.0 for x, y in zip(left, right)]

    # ch_code 8 = left/side: side subframe carries bps+1 bits
    blob = (streaminfo(8000, 2, 8, 4)
            + frame([sub_verbatim(left, 8), sub_verbatim(side, 9)],
                    4, 8))
    samples, _ = decode_flac(blob)
    assert [v * 128 for v in samples] == mono

    # ch_code 9 = side/right
    blob = (streaminfo(8000, 2, 8, 4)
            + frame([sub_verbatim(side, 9), sub_verbatim(right, 8)],
                    4, 9))
    samples, _ = decode_flac(blob)
    assert [v * 128 for v in samples] == mono

    # ch_code 10 = mid/side (mid drops the sum's LSB; the side's
    # parity restores it)
    blob = (streaminfo(8000, 2, 8, 4)
            + frame([sub_verbatim(mid, 8), sub_verbatim(side, 9)],
                    4, 10))
    samples, _ = decode_flac(blob)
    assert [v * 128 for v in samples] == mono

    # independent stereo (ch_code 1) averages the channels
    blob = (streaminfo(8000, 2, 8, 4)
            + frame([sub_verbatim(left, 8), sub_verbatim(right, 8)],
                    4, 1))
    samples, _ = decode_flac(blob)
    assert [v * 128 for v in samples] == mono


def test_wasted_bits_and_escape_partition():
    """A subframe with 2 wasted bits stores bps-2-bit values shifted
    left on output; an escaped Rice partition stores fixed-width
    two's-complement residuals."""
    def sub_wasted(w):
        # wasted flag 1, then unary(wasted-1): one 0 then stop bit
        w.b(0, 1).b(1, 6).b(1, 1)
        w.b(1, 2)                             # unary 1 → wasted = 2
        for v in (3, -2, 1, 0):
            w.s(v, 6)                         # bps 8 - 2 wasted

    blob = streaminfo(8000, 1, 8, 4) + frame([sub_wasted], 4, 0)
    samples, _ = decode_flac(blob)
    assert [round(v * 128) for v in samples] == [12, -8, 4, 0]

    def sub_escape(w):
        w.b(0, 1).b(8, 6).b(0, 1)             # FIXED order 0
        w.b(0, 2).b(0, 4)                     # 4-bit Rice, po=0
        w.b(0xF, 4)                           # ESCAPE
        w.b(5, 5)                             # 5-bit raw residuals
        for v in (7, -7, 0, 15):
            w.s(v, 5)

    blob = streaminfo(8000, 1, 8, 4) + frame([sub_escape], 4, 0)
    samples, _ = decode_flac(blob)
    assert [round(v * 128) for v in samples] == [7, -7, 0, 15]


def test_rice_partitions_split():
    """Partition order 1 splits the block in two with independent
    parameters; the first partition excludes warmup samples."""
    s = [100, 1, 2, 3, -1, -2, -3, 50]
    res = s[1:]                               # order-1 FIXED: r = s[n]-s[n-1]
    res = [s[n] - s[n - 1] for n in range(1, len(s))]

    def sub(w):
        w.b(0, 1).b(8 + 1, 6).b(0, 1)         # FIXED order 1
        w.s(100, 8)
        w.b(0, 2).b(1, 4)                     # po=1 → two partitions
        w.b(7, 4)                             # param for part 1 (3 vals)
        for r in res[:3]:
            w.rice(r, 7)
        w.b(6, 4)                             # param for part 2 (4 vals)
        for r in res[3:]:
            w.rice(r, 6)

    blob = streaminfo(8000, 1, 8, 8) + frame([sub], 8, 0)
    samples, _ = decode_flac(blob)
    assert [round(v * 128) for v in samples] == s


def test_encoder_twin_roundtrip_and_meta():
    """Verbatim encoder → decoder round trip at 16-bit over multiple
    frames, plus STREAMINFO metadata probes."""
    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32768, 10000).astype(np.int64)
    blob = encode_flac(pcm, 44100, bps=16, blocksize=4096)
    samples, rate = decode_flac(blob)
    assert rate == 44100
    assert np.array_equal((samples * 32768.0).round().astype(np.int64),
                          pcm)

    info = parse_streaminfo(blob)
    assert (info["rate"], info["channels"], info["bits"],
            info["total_samples"]) == (44100, 1, 16, 10000)

    from exam_pdf_parser_spark.core.audio import decode_audio_any
    got, rate2 = decode_audio_any(blob)
    assert rate2 == 44100 and np.array_equal(got, samples)

    from exam_pdf_parser_spark.operators.multimodal import parse_meta
    m = parse_meta(blob)
    assert m == {"kind": "audio", "width": 44100, "height": 1,
                 "n_frames": 10000, "valid": "ok"}


def test_crc_guards_and_fuzz_gate():
    """Any header/payload corruption raises (never returns garbage
    silently past a CRC, never hangs): quarantine contract."""
    pcm = np.arange(-500, 500, dtype=np.int64)
    blob = bytearray(encode_flac(pcm, 8000, bps=16, blocksize=256))

    # flip one payload byte inside the first frame → CRC-16 mismatch
    bad = bytearray(blob)
    bad[70] ^= 0xFF
    with pytest.raises((ValueError, NotImplementedError)):
        decode_flac(bytes(bad))

    # flip the sync byte → sync lost
    info = parse_streaminfo(bytes(blob))
    bad = bytearray(blob)
    bad[info["frames_off"]] = 0x00
    with pytest.raises(ValueError, match="sync"):
        decode_flac(bytes(bad))

    # truncation mid-frame → truncated, declared length unmet, or a
    # CRC/structure error — always an exception
    for cut in (10, 40, len(blob) // 2, len(blob) - 3):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_flac(bytes(blob[:cut]))

    # deterministic byte-flip fuzz across the stream
    rng = np.random.default_rng(11)
    for _ in range(200):
        bad = bytearray(blob)
        i = int(rng.integers(4, len(bad)))
        bad[i] ^= int(rng.integers(1, 256))
        try:
            out, _ = decode_flac(bytes(bad))
            assert len(out) <= len(pcm)       # never fabricates extra
        except (ValueError, NotImplementedError):
            pass


def test_reserved_codes_stay_loud():
    """Reserved subframe types / residual methods / channel modes
    raise NotImplementedError, malformed structure ValueError."""
    def sub_reserved(w):
        w.b(0, 1).b(2, 6).b(0, 1)             # subframe type 2 reserved

    blob = streaminfo(8000, 1, 8, 4) + frame([sub_reserved], 4, 0)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_flac(blob)

    with pytest.raises(ValueError, match="FLAC"):
        parse_streaminfo(b"fLaX" + b"\x00" * 40)
    with pytest.raises(ValueError):
        parse_streaminfo(b"fLaC" + b"\x00\x00\x00")
