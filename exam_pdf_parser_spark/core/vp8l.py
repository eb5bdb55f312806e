"""WebP VP8L (lossless) pixel decode — pure Python + numpy, no image
library.

Implements the public WebP Lossless Bitstream Specification (RFC 9649 /
the "WebP Lossless Bitstream Specification"): LSB-first bit reading,
canonical prefix codes (simple 1-2-symbol form and the code-length-
coded form with 16/17/18 repeats), meta prefix (entropy-image) groups,
the color cache, LZ77 with the 120-entry two-dimensional distance map,
and all four inverse transforms — predictor (14 modes, incl. the
Select / ClampAddSubtract modes and the spec's contiguous-buffer
top-right rule on the rightmost column), cross-color, subtract-green,
and color indexing with sub-byte pixel bundling.

Lossy VP8 (DCT + loop-filter codec) remains a fail-loud stub in
``operators.multimodal.decode_image`` — this module closes the
LOSSLESS half, which is pure prefix codes + reversible transforms.

Robustness contract (shared with core/{jpeg,tiff,bmp}.py): malformed
or truncated streams raise ValueError — they never hang, loop, or
fabricate pixels.  No reference-repo counterpart exists
(/root/reference has no image codecs).
"""

from __future__ import annotations

import struct

import numpy as np

_SIG = 0x2F
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                      11, 12, 13, 14, 15)
_MAX_CACHE_BITS = 11


class _Bits:
    """LSB-first bit reader (VP8L ``ReadBits`` semantics)."""

    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.nbits = len(buf) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L: truncated bitstream")
        v = 0
        buf, pos = self.buf, self.pos
        for i in range(n):
            v |= ((buf[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
        self.pos += n
        return v


class _Prefix:
    """Canonical prefix code: symbols in index order get codes of
    their length in canonical (DEFLATE-style) order; decode walks the
    accumulated bits MSB-first (the spec's packing)."""

    __slots__ = ("table", "single", "maxlen")

    def __init__(self, lengths: list[int]):
        nz = [(sym, ln) for sym, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            self.maxlen = 0
            return
        self.single = None
        maxlen = max(ln for _, ln in nz)
        if maxlen > 15:
            raise ValueError("VP8L: code length > 15")
        bl_count = [0] * (maxlen + 1)
        for _, ln in nz:
            bl_count[ln] += 1
        # Kraft completeness: an over- or under-full code is corrupt
        kraft = sum(bl_count[ln] << (maxlen - ln)
                    for ln in range(1, maxlen + 1))
        if kraft != 1 << maxlen:
            raise ValueError("VP8L: invalid prefix code (Kraft)")
        code = 0
        next_code = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table: dict[tuple[int, int], int] = {}
        for sym, ln in nz:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table
        self.maxlen = maxlen

    def read_sym(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):                              # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        s0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L: bad simple-code symbols")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
            code = _Prefix.__new__(_Prefix)
            code.single = s0
            code.table = None
            code.maxlen = 0
            return code
        return _Prefix(lengths)

    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)

    if br.read(1):                              # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = clc.read_sym(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if sym + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return _Prefix(lengths)


def _prefix_value(br: _Bits, prefix_code: int) -> int:
    """LZ77 length / distance value from its prefix code + extra
    bits (spec: 24 codes cover 1..2^24)."""
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read(extra) + 1


def _build_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry 2D neighborhood: offsets (dx, dy) with
    dy ∈ [0,7], dx ∈ [-7,8] (dy>0 or dx>0 — exactly 120), ordered by
    squared distance, then larger dy first, then positive dx first."""
    cands = [(dx, dy) for dy in range(8) for dx in range(-7, 9)
             if dy > 0 or dx > 0]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              p[0] < 0))
    assert len(cands) == 120
    return cands


_DIST_MAP = _build_distance_map()


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_stream(br: _Bits, xsize: int, ysize: int, level0: bool):
    """One <entropy-coded image> (plus transforms at level 0).
    Returns (pixels as list of ARGB ints, xsize_after_transform_reads,
    transforms as read-ordered [(type, data, xsize_at_read)])."""
    transforms: list[tuple[int, tuple, int]] = []
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 2:                      # subtract green
                transforms.append((2, (), xsize))
            elif ttype in (0, 1):               # predictor / cross-color
                bits = br.read(3) + 2
                sub_w = _subsample(xsize, bits)
                sub_h = _subsample(ysize, bits)
                sub, _, _ = _decode_stream(br, sub_w, sub_h, False)
                transforms.append((ttype, (bits, sub, sub_w), xsize))
            elif ttype == 3:                    # color indexing
                psize = br.read(8) + 1
                pal, _, _ = _decode_stream(br, psize, 1, False)
                for i in range(1, psize):       # palette is delta-coded
                    p, q = pal[i], pal[i - 1]
                    pal[i] = ((((p >> 24) + (q >> 24)) & 0xFF) << 24) \
                        | (((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF))
                            & 0xFF) << 16) \
                        | (((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF))
                            & 0xFF) << 8) \
                        | (((p & 0xFF) + (q & 0xFF)) & 0xFF)
                wbits = 3 if psize <= 2 else 2 if psize <= 4 \
                    else 1 if psize <= 16 else 0
                transforms.append((3, (wbits, pal), xsize))
                if wbits:
                    xsize = _subsample(xsize, wbits)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= _MAX_CACHE_BITS:
            raise ValueError("VP8L: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    hbits = hx = 0
    n_groups = 1
    if level0 and br.read(1):                   # meta prefix codes
        hbits = br.read(3) + 2
        hx = _subsample(xsize, hbits)
        hy = _subsample(ysize, hbits)
        meta_img, _, _ = _decode_stream(br, hx, hy, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        n_groups = max(meta) + 1

    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [tuple(_read_prefix_code(br, a) for a in alphabets)
              for _ in range(n_groups)]

    n = xsize * ysize
    pix: list[int] = [0] * n
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            g = groups[meta[(y >> hbits) * hx + (x >> hbits)]]
        else:
            g = groups[0]
        s = g[0].read_sym(br)
        if s < 256:                             # literal (G, then R,B,A)
            red = g[1].read_sym(br)
            blue = g[2].read_sym(br)
            alpha = g[3].read_sym(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            pos += 1
            if cache_size:
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> shift] = argb
        elif s < 280:                           # LZ77 backward reference
            length = _prefix_value(br, s - 256)
            dist_sym = g[4].read_sym(br)
            dist = _plane_code_to_distance(
                xsize, _prefix_value(br, dist_sym))
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                pos += 1
                if cache_size:
                    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                          >> shift] = argb
        else:                                   # color-cache hit
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            pix[pos] = cache[idx]
            pos += 1
    return pix, xsize, transforms


# --- inverse transforms ------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return ((((a >> 24) + (b >> 24)) >> 1) << 24) \
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16) \
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8) \
        | (((a & 0xFF) + (b & 0xFF)) >> 1)


def _add_px(a: int, b: int) -> int:
    return ((((a >> 24) + (b >> 24)) & 0xFF) << 24) \
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16) \
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8) \
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)


def _select(t: int, l_: int, tl: int) -> int:
    p = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l_ >> sh) & 0xFF, (tl >> sh) & 0xFF
        p += abs(lc - tlc) - abs(tc - tlc)
    return t if p <= 0 else l_


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _cas_full(l_: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l_ >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                      - ((tl >> sh) & 0xFF)) << sh
    return out


def _cas_half(l_: int, t: int, tl: int) -> int:
    ave = _avg2(l_, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a, b = (ave >> sh) & 0xFF, (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)   # C trunc-toward-0
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l_: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l_
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l_, tr), t)
    if mode == 6:
        return _avg2(l_, tl)
    if mode == 7:
        return _avg2(l_, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l_, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l_, tl)
    if mode == 12:
        return _cas_full(l_, t, tl)
    if mode == 13:
        return _cas_half(l_, t, tl)
    raise ValueError(f"VP8L: bad predictor mode {mode}")


def _inv_predictor(pix: list[int], w: int, h: int, bits: int,
                   sub: list[int], sub_w: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[pos - 1]             # top row: L
            elif x == 0:
                pred = pix[pos - w]             # left column: T
            else:
                mode = (sub[(y >> bits) * sub_w + (x >> bits)] >> 8) \
                    & 0xFF
                l_ = pix[pos - 1]
                t = pix[pos - w]
                tl = pix[pos - w - 1]
                # rightmost column: TR is the CURRENT row's first
                # pixel (the spec's contiguous-buffer rule)
                tr = pix[pos - w + 1]
                pred = _predict(mode, l_, t, tl, tr)
            pix[pos] = _add_px(pix[pos], pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inv_color_transform(pix: list[int], w: int, h: int, bits: int,
                         sub: list[int], sub_w: int) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            cte = sub[(y >> bits) * sub_w + (x >> bits)]
            g2r = cte & 0xFF                    # blue channel
            g2b = (cte >> 8) & 0xFF             # green channel
            r2b = (cte >> 16) & 0xFF            # red channel
            p = pix[row + x]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            b &= 0xFF
            pix[row + x] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_subtract_green(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inv_color_indexing(pix: list[int], packed_w: int, h: int,
                        wbits: int, palette: list[int],
                        out_w: int) -> list[int]:
    if wbits == 0:
        out = [0] * (out_w * h)
        for i, p in enumerate(pix):
            idx = (p >> 8) & 0xFF
            out[i] = palette[idx] if idx < len(palette) else 0
        return out
    bpp = 8 >> wbits                            # bits per packed index
    per = 1 << wbits                            # pixels per packed byte
    mask = (1 << bpp) - 1
    out = [0] * (out_w * h)
    for y in range(h):
        for x in range(out_w):
            packed = pix[y * packed_w + (x >> wbits)]
            idx = ((packed >> 8) >> ((x % per) * bpp)) & mask
            out[y * out_w + x] = palette[idx] if idx < len(palette) else 0
    return out


def decode_vp8l(data: bytes) -> np.ndarray:
    """VP8L chunk payload (starting at the 0x2F signature byte) →
    (h, w, 4) uint8 RGBA."""
    br = _Bits(data)
    if br.read(8) != _SIG:
        raise ValueError("VP8L: bad signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    pix, cur_w, transforms = _decode_stream(br, w, h, True)
    for ttype, tdata, xsize_at_read in reversed(transforms):
        if ttype == 3:
            wbits, palette = tdata
            pix = _inv_color_indexing(pix, cur_w, h, wbits, palette,
                                      xsize_at_read)
            cur_w = xsize_at_read
        elif ttype == 2:
            _inv_subtract_green(pix)
        elif ttype == 0:
            bits, sub, sub_w = tdata
            _inv_predictor(pix, cur_w, h, bits, sub, sub_w)
        elif ttype == 1:
            bits, sub, sub_w = tdata
            _inv_color_transform(pix, cur_w, h, bits, sub, sub_w)
    if cur_w != w:
        raise ValueError("VP8L: width mismatch after transforms")

    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF            # R
    out[..., 1] = (arr >> 8) & 0xFF             # G
    out[..., 2] = arr & 0xFF                    # B
    out[..., 3] = (arr >> 24) & 0xFF            # A
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container (or a bare VP8L chunk payload) → RGBA.
    Lossless VP8L decodes natively; lossy VP8 raises loudly (DCT codec
    with no stdlib path)."""
    if payload[:1] == b"\x2f":
        return decode_vp8l(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(payload):
        four = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if four == b"VP8L":
            return decode_vp8l(body)
        if four == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 (DCT) has no stdlib decode path; VP8L "
                "lossless decodes natively via core/vp8l.py")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L/VP8 image chunk found")


def decode_webp_gray(payload: bytes) -> np.ndarray:
    """(h, w) uint8 luma — RGB channel mean, matching the other
    codecs' gray convention (core/tiff.py, core/bmp.py)."""
    rgba = decode_webp(payload)
    return rgba[..., :3].mean(axis=2).astype(np.uint8)
