"""Minimal, dependency-free JPEG codec (grayscale output).

Completes the stdlib codec family (``core/png.py``, ``core/gif.py``):
the decoder handles BOTH baseline sequential (SOF0/1) and progressive
(SOF2) Huffman JPEG — DQT/DHT/SOF/SOS/DRI marker walk, canonical
Huffman decode with byte unstuffing and restart markers, and for
progressive streams the full successive-approximation machinery (DC
first/refine, AC first/refine with EOB runs) accumulating into a
per-component coefficient store; dequant + zigzag + float IDCT run
once at the end.  Output is (h, w) uint8 grayscale: the luma plane
for 1/3-component frames (chroma entropy-decoded to keep the
bitstream in sync, then discarded), the ink-transform gray for
4-component Adobe CMYK/YCCK frames, and a rint(v*255/4095) mapping
for 12-bit (SOF precision 12) frames.  Lossless (SOF3, spec Annex H)
frames decode too: Huffman-coded predictor differences with all seven
spatial predictors, point transform, restart-reset prediction, and
2-16-bit precision — the flavor real crawls hit inside DNG and
lossless-JPEG-in-TIFF containers.  Arithmetic-coded and hierarchical
variants raise a clear error.

The encoder writes grayscale JPEG with the JPEG Annex K example
quantization/Huffman tables (public spec constants) — baseline by
default, or a spectral-split progressive stream whose decode is
bit-identical to the baseline encoding (tested), plus real ``.jpg``
files any viewer opens.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order (JPEG spec figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 example luminance quantization table (spec constants)
STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (bit-length counts 1..16, symbols)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8) * np.cos((2 * k[None, :] + 1) * k[:, None]
                                  * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c


_C = _dct_matrix()


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict:
    """(bit length, code) → symbol, canonical JPEG Huffman."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF00
    unstuffing; restart markers are handled by the caller via align()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            b = 0                       # zero-fill past a truncated tail
        else:
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    raise _RestartHit()
                else:
                    # EOI or the next marker: feed zero bits WITHOUT
                    # consuming, so trailing padding reads resolve and
                    # the marker stays in place (spec decoders do the
                    # same at scan end)
                    b = 0
            else:
                self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        # drop consumed high bits — an unmasked acc grows with the
        # whole stream and turns every shift O(bits-so-far)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict) -> int:
        if table is None:
            # a (possibly corrupt) scan referencing a DHT id that was
            # never defined — controlled quarantine, not AttributeError
            raise ValueError("scan references an undefined Huffman table")
        length = 0
        code = 0
        while length < 17:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_restart(self) -> None:
        """Drop partial bits and consume the RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG scan: restart marker not found")
        self.pos += 2


class _RestartHit(Exception):
    pass


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline OR progressive JPEG → (h, w) uint8 luma plane.

    Unified engine: every scan (baseline full, progressive DC
    first/refine, AC first/refine with EOB runs) accumulates into a
    per-component coefficient store; dequant + IDCT happen once at
    the end.  For 1- and 3-component frames the luma plane is the
    output and chroma is entropy-decoded only to keep the stream in
    sync; 4-component Adobe frames (CMYK / YCCK per APP14) decode all
    four planes and reduce to gray through the TIFF ink convention
    (see ``_reconstruct_cmyk_gray``)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart = 0
    pos = 2
    n = len(payload)
    saw_scan = False
    prec = 8                     # SOF sample precision (8 or 12 bit)
    lossless = False             # SOF3 (Annex H) predictive frame
    adobe = False                # APP14 "Adobe" seen (inverted-ink CMYK)
    adobe_transform = 0          # 0=CMYK passthrough, 2=YCCK
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("desynchronized JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xFF:                       # fill byte (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:                       # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(body[i:i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(body[i:i + 64], np.uint8).astype(np.int64)
                    i += 64
                quant[tq] = vals
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1:i + 17])
                n_sym = sum(counts)
                syms = list(body[i + 17:i + 17 + n_sym])
                (huff_ac if tc else huff_dc)[th] = _canonical_codes(
                    counts, syms)
                i += 17 + n_sym
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 baseline, SOF2 prog
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if _prec not in (8, 12):
                # the spec defines only 8- and 12-bit DCT precision
                raise NotImplementedError(
                    f"{_prec}-bit JPEG not supported")
            prec = _prec
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]          # MCU-padded block grid
                c["bh"] = mcuy * c["v"]
                # true (non-padded) grid for non-interleaved scans
                cw = -(-w * c["h"] // hmax)      # ceil(w·h_i/hmax)
                ch = -(-h * c["v"] // vmax)
                c["tw"] = -(-cw // 8)
                c["th"] = -(-ch // 8)
                c["coef"] = np.zeros((c["bh"], c["bw"], 64), np.int32)
            comps[0]["mcux"], comps[0]["mcuy"] = mcux, mcuy
        elif marker == 0xC3:                     # SOF3 lossless (Annex H)
            lossless = True
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if not 2 <= _prec <= 16:             # spec Annex H range
                raise ValueError(f"lossless JPEG precision {_prec}")
            prec = _prec
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    # DNG / lossless-in-TIFF use 1x1 sampling; an
                    # interleave-subsampled lossless frame needs the
                    # Annex H MCU sample geometry we have no real
                    # corpus vector for — quarantine, don't guess
                    raise NotImplementedError(
                        "subsampled lossless JPEG not supported")
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq,
                              "plane": np.zeros((h, w), np.int32)})
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/progressive/lossless Huffman JPEG "
                "is supported")
        elif marker == 0xDD:                     # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xEE and body[:5] == b"Adobe":    # APP14
            # Adobe transform flag (tech note #5116): 0 = component
            # passthrough (CMYK for 4-comp), 2 = YCCK.  Presence of
            # the marker also signals Adobe's inverted-ink storage.
            adobe = True
            if len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:                     # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tables = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(
                        "scan component id absent from the frame header")
                comp["dc"] = huff_dc.get(tables >> 4)
                comp["ac"] = huff_ac.get(tables & 0x0F)
                scan.append(comp)
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            data_start = pos + 2 + seg_len
            scan_end = _find_scan_end(payload, data_start)
            try:
                if lossless:
                    # Annex H reuse of the scan header: Ss = predictor
                    # selector 1-7, Se = 0, Ah = 0, Al = point transform
                    if not 1 <= ss <= 7 or se != 0 or (ahal >> 4) != 0:
                        raise ValueError(
                            "invalid lossless scan header "
                            f"(Ss={ss} Se={se} AhAl={ahal:#x})")
                    _decode_lossless_scan(payload, data_start, scan,
                                          ss, ahal & 0x0F, prec, restart)
                else:
                    _decode_scan_into(payload, data_start, comps, scan,
                                      ss, se, ahal >> 4, ahal & 0x0F,
                                      restart)
            except _RestartHit:
                raise ValueError(
                    "restart marker misaligned with DRI") from None
            saw_scan = True
            pos = scan_end
            continue
        pos += 2 + seg_len
    if not saw_scan:
        raise ValueError("JPEG contains no scan")
    if lossless:
        out = _reconstruct_lossless_gray(comps, prec, adobe,
                                         adobe_transform)
    elif len(comps) == 4:
        out = _reconstruct_cmyk_gray(
            comps, quant, h, w, adobe, adobe_transform, prec)
    else:
        out = _reconstruct_luma(comps, quant, h, w, prec)
    o = exif_orientation(payload)
    if o != 1:
        from .tiff import _apply_orientation

        out = _apply_orientation(out, o)
    return out


def _find_scan_end(data: bytes, start: int) -> int:
    i = start
    n = len(data)
    while True:
        i = data.find(b"\xff", i)      # C-speed skip between FF bytes
        if i < 0 or i + 1 >= n:
            return n
        nxt = data[i + 1]
        if nxt != 0x00 and not 0xD0 <= nxt <= 0xD7:
            return i
        i += 2


def _decode_scan_into(data: bytes, start: int, comps: list[dict],
                      scan: list[dict], ss: int, se: int, ah: int,
                      al: int, restart: int) -> None:
    br = _BitReader(data, start)
    preds = {c["id"]: 0 for c in scan}
    eobrun = 0

    def maybe_restart(unit: int) -> None:
        nonlocal preds, eobrun
        if restart and unit and unit % restart == 0:
            br.align_restart()
            preds = {c["id"]: 0 for c in scan}
            eobrun = 0

    if len(scan) > 1 or (ss == 0 and se == 63):
        # interleaved (or baseline single-comp full) scan: MCU order
        c0 = comps[0]
        mcux, mcuy = c0["mcux"], c0["mcuy"]
        if len(scan) == 1:
            # non-interleaved full scan: block grid IS the true grid
            c = scan[0]
            for i in range(c["th"] * c["tw"]):
                maybe_restart(i)
                by, bx = divmod(i, c["tw"])
                _block_first(br, c, by, bx, ss, se, ah, al, preds)
            return
        for mcu in range(mcux * mcuy):
            maybe_restart(mcu)
            mx, my = mcu % mcux, mcu // mcux
            for c in scan:
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        _block_first(br, c, my * c["v"] + byy,
                                     mx * c["h"] + bxx, ss, se, ah, al,
                                     preds)
        return

    # single-component partial scan (progressive): true grid, row-major
    c = scan[0]
    n_blocks = c["th"] * c["tw"]
    for i in range(n_blocks):
        maybe_restart(i)
        by, bx = divmod(i, c["tw"])
        coef = c["coef"][by, bx]
        if ss == 0:                              # DC-only scan
            _block_first(br, c, by, bx, ss, se, ah, al, preds)
            continue
        if ah == 0:                              # AC first
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = br.huff(c["ac"])
                r, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                coef[k] = _extend(br.bits(sz), sz) << al
                k += 1
        else:                                    # AC refinement
            eobrun = _refine_ac(br, c["ac"], coef, ss, se, al, eobrun)


def _block_first(br: "_BitReader", c: dict, by: int, bx: int, ss: int,
                 se: int, ah: int, al: int, preds: dict) -> None:
    """DC (+AC for baseline) decode of one block in an interleaved or
    full scan; Ah>0 means DC refinement."""
    coef = c["coef"][by, bx]
    if ah == 0:
        t = br.huff(c["dc"])
        diff = _extend(br.bits(t), t) if t else 0
        preds[c["id"]] += diff
        coef[0] = preds[c["id"]] << al
    else:
        if br.bits(1):
            coef[0] = int(coef[0]) | (1 << al)
    if se == 0 or ah != 0:
        return
    k = 1
    while k <= se:
        rs = br.huff(c["ac"])
        r, sz = rs >> 4, rs & 0x0F
        if sz == 0:
            if r == 15:
                k += 16
                continue
            break                                # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[k] = _extend(br.bits(sz), sz) << al
        k += 1


def _refine_ac(br: "_BitReader", ac_table: dict, coef: np.ndarray,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """Successive-approximation AC refinement (spec G.1.2.3): apply
    correction bits to known-nonzero coefficients, insert new ±1<<al
    coefficients, honor EOB runs."""
    p1, m1 = 1 << al, -1 << al

    def correct(k: int) -> None:
        # a correction bit is read for EVERY nonzero coefficient
        # visited (skipping the read desyncs the stream); it applies
        # only when this scan's bit isn't already set
        v = int(coef[k])
        if v and br.bits(1) and (v & p1) == 0:
            coef[k] = v + (p1 if v > 0 else m1)

    # eobrun convention (libjpeg): INCLUSIVE of the current block — an
    # EOB with r=0 still yields eobrun=1 so this block's remaining
    # nonzero coefficients get their correction bits before the
    # decrement; skipping them desyncs the stream
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(ac_table)
            r, sz = rs >> 4, rs & 0x0F
            val = 0
            if sz == 0:
                if r < 15:
                    eobrun = (1 << r) + (br.bits(r) if r else 0)
                    break
                # r == 15: skip 16 zero-history positions
            else:
                val = p1 if br.bits(1) else m1
            while k <= se:
                if coef[k]:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_lossless_scan(data: bytes, start: int, scan: list[dict],
                          predictor: int, pt: int, prec: int,
                          restart: int) -> None:
    """Annex H predictive scan: one Huffman-coded difference per
    sample, reconstructed modulo 65536 against a spatial prediction.

    Geometry: sampling is 1x1 (enforced at SOF3), so an interleaved
    MCU is exactly one sample per scan component and the MCU raster IS
    the pixel raster.  Prediction (spec H.1.2 / H.2.2):

      * the first sample of the scan — and of each restart interval,
        which must be independently decodable — predicts
        ``2^(P - Pt - 1)``;
      * the rest of the first line of the scan AND of each restart
        interval uses Ra (the left neighbor) — H.1.2: "the
        one-dimensional horizontal predictor (Ra) is used for the
        first line of samples at the start of the scan and at the
        beginning of each restart interval";
      * the first sample of every other line uses Rb (above);
      * everywhere else the scan's selected predictor 1-7 applies,
        with the spec's arithmetic right shifts (Python ``>>`` on
        negative ints is the same floor shift).

    Values are kept in the point-transformed domain during prediction
    and shifted left by Pt once at scan end (H.2.3); SSSS category 16
    encodes diff = 32768 with no extra bits, the one magnitude EXTEND
    cannot reach.  No clipping here — the gray mapping clips once, so
    corrupt streams degrade instead of crashing."""
    br = _BitReader(data, start)
    h, w = scan[0]["plane"].shape
    half = 1 << (prec - pt - 1)
    planes = [c["plane"] for c in scan]
    tables = [c["dc"] for c in scan]
    nc = len(scan)
    fresh = [True] * nc          # next sample takes the default pred
    restart_y = 0                # row where the current interval began
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart and mcu and mcu % restart == 0:
                br.align_restart()
                fresh = [True] * nc
                restart_y = y    # this row is the interval's first line
            mcu += 1
            for ci in range(nc):
                t = br.huff(tables[ci])
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(br.bits(t), t)
                else:
                    diff = 0
                p = planes[ci]
                if fresh[ci]:
                    px = half
                    fresh[ci] = False
                elif y == restart_y:
                    # first line of the scan / restart interval: Ra
                    # (x >= 1 here — the interval's first sample took
                    # the default prediction above)
                    px = int(p[y, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                elif predictor == 1:
                    px = int(p[y, x - 1])
                elif predictor == 2:
                    px = int(p[y - 1, x])
                elif predictor == 3:
                    px = int(p[y - 1, x - 1])
                else:
                    ra, rb = int(p[y, x - 1]), int(p[y - 1, x])
                    rc = int(p[y - 1, x - 1])
                    if predictor == 4:
                        px = ra + rb - rc
                    elif predictor == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif predictor == 6:
                        px = rb + ((ra - rc) >> 1)
                    else:
                        px = (ra + rb) >> 1
                p[y, x] = (px + diff) % 65536
    if pt:
        for p in planes:
            np.left_shift(p, pt, out=p)


def _reconstruct_lossless_gray(comps: list[dict], prec: int,
                               adobe: bool, transform: int) -> np.ndarray:
    """Lossless sample planes → uint8 gray.  One component maps
    straight through ``rint(v*255/maxv)`` (identity at prec=8, the
    12-bit discipline otherwise).  Three components: lossless frames
    have NO default color transform (Annex H codes components
    independently), so they are RGB unless an Adobe APP14 declares
    YCbCr (transform 1, luma plane) — RGB reduces by the same
    mean-gray convention as the ink path.  2- and 4-component
    lossless frames are CFA sensor mosaics (the Canon CR2 / DNG raw
    shape): NO demosaic is attempted — the output is the raw mosaic
    plane, components re-interleaved per column in the T.81
    interleaved-MCU sample order (one sample per component per MCU,
    so the physical row is ``c0 c1 [c2 c3] c0 c1 …`` and the real
    raster width is SOF-width × nc, which the ``_jpeg_dims`` probe
    mirrors).  That is pure container math — every output sample is
    a decoded sample, none is interpolated."""
    maxv = float((1 << prec) - 1)
    planes = [c["plane"].astype(np.float64) for c in comps]
    if len(planes) == 1:
        g = planes[0]
    elif len(planes) == 3:
        g = (planes[0] if adobe and transform == 1
             else (planes[0] + planes[1] + planes[2]) / 3.0)
    elif len(planes) in (2, 4):  # CFA mosaic: column interleave
        h, w = planes[0].shape
        nc = len(planes)
        g = np.empty((h, w * nc), np.float64)
        for i, p in enumerate(planes):
            g[:, i::nc] = p
    else:
        # no CFA layout defines 5+ sensor channels, and the dims
        # probe only mirrors nc in (2, 4) — fail loud, don't guess
        raise NotImplementedError(
            f"{len(planes)}-component lossless JPEG not supported")
    return np.clip(np.rint(g * (255.0 / maxv)),
                   0.0, 255.0).astype(np.uint8)


def _reconstruct_plane(comps: list[dict], c: dict, quant: dict, h: int,
                       w: int, prec: int = 8,
                       native: bool = False) -> np.ndarray:
    """One component's coefficient store → (h, w) float64 samples in
    [0, 255]: dequant, IDCT, nearest-neighbor upsample to the luma
    grid, level shift, clip.  Float so multi-plane color transforms
    (CMYK/YCCK) don't quantize twice.

    12-bit frames (SOF precision 12): level shift 2048, clip to
    [0, 4095], then map linearly onto the 8-bit gray domain with
    round-to-nearest (``rint(v*255/4095)`` — a value exactly halfway
    is impossible, the scale is rational with denominator 4095, so
    the mapping is float-error-stable).  ``native=True`` skips that
    final mapping and returns the clipped [0, 2^prec-1] samples —
    multi-plane color transforms must run in the native domain
    (center 2048, not 128) and map to 8-bit ONCE at the end, or the
    per-plane quantization + the wrong chroma center bias every
    pixel (for prec=8 the domains coincide and ``native`` is a
    no-op)."""
    q = quant[c["tq"]].astype(np.int64)
    zz = c["coef"].reshape(-1, 64).astype(np.float64) * q[None, :]
    nat = np.zeros_like(zz)
    nat[:, ZIGZAG] = zz
    blk = nat.reshape(-1, 8, 8)
    idct = np.einsum("ij,bjk,kl->bil", _C.T, blk, _C)
    bh, bw = c["bh"], c["bw"]
    plane = idct.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(bh * 8, bw * 8)
    hmax = max(cc["h"] for cc in comps)
    vmax = max(cc["v"] for cc in comps)
    sy, sx = vmax // c["v"], hmax // c["h"]
    if sy > 1 or sx > 1:
        plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
    if prec == 8:
        return np.clip(plane[:h, :w] + 128.0, 0.0, 255.0)
    maxv = float((1 << prec) - 1)
    deep = np.clip(plane[:h, :w] + float(1 << (prec - 1)), 0.0, maxv)
    if native:
        return deep
    return np.rint(deep * (255.0 / maxv))


def _reconstruct_luma(comps: list[dict], quant: dict, h: int,
                      w: int, prec: int = 8) -> np.ndarray:
    return _reconstruct_plane(comps, comps[0], quant, h, w, prec) \
        .astype(np.uint8)


def _reconstruct_cmyk_gray(comps: list[dict], quant: dict, h: int,
                           w: int, adobe: bool,
                           transform: int, prec: int = 8) -> np.ndarray:
    """4-component (CMYK/YCCK) frame → gray, the TIFF photometric-5
    convention (core/tiff.py): R=(255-C)(255-K)/255 etc., gray is the
    RGB channel mean.

    Storage semantics (Adobe tech note #5116 + the libjpeg-documented
    convention): with an APP14 "Adobe" marker the four samples are
    stored INVERTED (value = 255 - ink) — so the stored planes are
    already the (255-ink) factors; without APP14 the samples are plain
    ink.  ``transform == 2`` (YCCK) means the inverted CMY planes were
    additionally run through the BT.601 YCbCr forward transform — undo
    it with the same coefficients the TIFF YCbCr branch uses, then
    treat the result as inverted CMY.  K is never color-transformed.

    12-bit frames run the whole transform in the NATIVE domain
    (center 2048, scale 4095) and map to 8-bit gray once at the end —
    quantizing each plane to 8 bits first would both round twice and
    mis-center the chroma inverse (2048 maps to ~127.53, not 128).
    """
    planes = [_reconstruct_plane(comps, c, quant, h, w, prec,
                                 native=True)
              for c in comps]
    maxv = float((1 << prec) - 1)
    half = float(1 << (prec - 1))
    if transform == 2:
        if not adobe:
            raise ValueError("YCCK transform without an Adobe APP14")
        y, cb, cr, k = planes
        r = y + 1.402 * (cr - half)
        b = y + 1.772 * (cb - half)
        g = (y - 0.299 * r - 0.114 * b) / 0.587
        planes = [np.clip(r, 0.0, maxv), np.clip(g, 0.0, maxv),
                  np.clip(b, 0.0, maxv), k]
    sc, sm, sy_, sk = planes
    if adobe:
        # stored = maxv - ink: the planes ARE the (maxv-ink) factors
        rgb = [p * sk / maxv for p in (sc, sm, sy_)]
    else:
        rgb = [(maxv - p) * (maxv - sk) / maxv
               for p in (sc, sm, sy_)]
    gray = (rgb[0] + rgb[1] + rgb[2]) / 3.0
    if prec == 8:
        return np.clip(gray + 0.5, 0, 255).astype(np.uint8)
    return np.clip(np.rint(gray * (255.0 / maxv)),
                   0.0, 255.0).astype(np.uint8)


def exif_orientation(payload: bytes) -> int:
    """Orientation from the APP1 Exif segment (an embedded TIFF IFD,
    tag 274), 1 when absent or unreadable — crawl JPEGs are routinely
    stored rotated with only this tag to say so."""
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return 1
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:                       # scan: no EXIF ahead
            return 1
        (seg,) = struct.unpack_from(">H", payload, i + 2)
        if marker == 0xE1 and payload[i + 4:i + 10] == b"Exif\x00\x00":
            tiff = payload[i + 10:i + 2 + seg]
            try:
                from .tiff import TIFF_SIGS, _read_ifd

                if tiff[:4] not in TIFF_SIGS:
                    return 1
                order = "<" if tiff[:2] == b"II" else ">"
                o = _read_ifd(tiff, order).get(274, [1])[0]
                return o if 1 <= o <= 8 else 1
            except Exception:
                return 1
        i += 2 + seg
    return 1


# --- encoder (baseline grayscale) ---------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.acc &= (1 << self.n) - 1        # keep acc small
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)            # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.out)


def _encode_tables() -> tuple[dict, dict]:
    def enc(counts, syms):
        table = {}
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[syms[i]] = (code, length)
                code += 1
                i += 1
            code <<= 1
        return table
    return enc(*STD_DC_LUMA), enc(*STD_AC_LUMA)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _quantized_blocks(img: np.ndarray) -> tuple[list, int, int]:
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    qz = STD_LUMA_QUANT[ZIGZAG]                  # quant in zigzag order
    blocks = []
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            blk = padded[y0:y0 + 8, x0:x0 + 8]
            zz = (_C @ blk @ _C.T).reshape(-1)[ZIGZAG]
            blocks.append(np.round(zz / qz).astype(np.int64))
    return blocks, h, w


def _write_dc(bw: "_BitWriter", dc_tab: dict, qcoef, pred: int) -> int:
    diff = int(qcoef[0]) - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    bw.bits(code, ln)
    if t:
        bw.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return int(qcoef[0])


def _write_ac(bw: "_BitWriter", ac_tab: dict, qcoef) -> None:
    run = 0
    nz = np.nonzero(qcoef[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(qcoef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.bits(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.bits(code, ln)
        bw.bits(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]                  # EOB
        bw.bits(code, ln)


def encode_jpeg_gray(img: np.ndarray, progressive: bool = False) -> bytes:
    """(h, w) uint8 → grayscale JPEG (Annex K tables).  Baseline by
    default; ``progressive=True`` writes a spectral-split SOF2 stream
    (scan 1: DC, scan 2: AC 1-63) — same quantized coefficients, so
    decode output is bit-identical to the baseline encoding (the
    decoder test pins that)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8 array")
    dc_tab, ac_tab = _encode_tables()
    blocks, h, w = _quantized_blocks(img)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        STD_LUMA_QUANT[ZIGZAG].astype(np.uint8))
    sof = 0xC2 if progressive else 0xC0
    out += bytes((0xFF, sof)) + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes((1, 0x11, 0))
    for tc, (counts, syms) in ((0, STD_DC_LUMA), (1, STD_AC_LUMA)):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(syms), (tc << 4)) + bytes(counts) + bytes(syms)

    if not progressive:
        bw = _BitWriter()
        pred = 0
        for qcoef in blocks:
            pred = _write_dc(bw, dc_tab, qcoef, pred)
            _write_ac(bw, ac_tab, qcoef)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) \
            + bytes((1, 0x00, 0, 63, 0))
        out += bw.flush() + b"\xff\xd9"
        return bytes(out)

    # progressive with SUCCESSIVE APPROXIMATION (4 scans), so the
    # decoder's refinement machinery is exercised by the round-trip
    # gate: DC first Al=1 → AC first Al=1 → DC refine → AC refine.
    def sos(params: tuple) -> bytes:
        return b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(params)

    bw = _BitWriter()                            # 1. DC first, Al=1
    pred = 0
    for qcoef in blocks:
        hi = [int(qcoef[0]) >> 1]                # arithmetic shift (spec)
        pred = _write_dc(bw, dc_tab, hi, pred)
    out += sos((1, 0x00, 0, 0, 0x01)) + bw.flush()

    bw = _BitWriter()                            # 2. AC first, Al=1
    for qcoef in blocks:
        shifted = np.array(
            [0] + [int(np.sign(v)) * (abs(int(v)) >> 1)
                   for v in qcoef[1:]], dtype=np.int64)
        _write_ac(bw, ac_tab, shifted)
    out += sos((1, 0x10, 1, 63, 0x01)) + bw.flush()

    bw = _BitWriter()                            # 3. DC refine, Al=0
    for qcoef in blocks:
        bw.bits(int(qcoef[0]) & 1, 1)            # raw bit, no Huffman
    out += sos((1, 0x00, 0, 0, 0x10)) + bw.flush()

    bw = _BitWriter()                            # 4. AC refine, Al=0
    for qcoef in blocks:
        _write_ac_refine(bw, ac_tab, qcoef, 0)
    out += sos((1, 0x10, 1, 63, 0x10)) + bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _write_ac_refine(bw: "_BitWriter", ac_tab: dict, qcoef,
                     al: int) -> None:
    """AC refinement scan for one block (per-block EOB flush): newly
    significant coefficients (abs>>al == 1) emit (run, 1) + sign;
    already-significant ones buffer their correction bit, flushed
    after each emitted code / ZRL / EOB — mirror image of
    ``_refine_ac``."""
    absv = [abs(int(qcoef[k])) >> al for k in range(64)]
    eob = 0
    for k in range(1, 64):
        if absv[k] == 1:
            eob = k
    r = 0
    br_bits: list[int] = []

    def flush_br() -> None:
        for b in br_bits:
            bw.bits(b, 1)
        br_bits.clear()

    for k in range(1, 64):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            code, ln = ac_tab[0xF0]              # ZRL inside the
            bw.bits(code, ln)                    # significant region
            r -= 16
            flush_br()
        if t > 1:                                # already significant:
            br_bits.append(t & 1)                # buffer correction bit
            continue
        code, ln = ac_tab[(r << 4) | 1]          # newly significant
        bw.bits(code, ln)
        bw.bits(0 if int(qcoef[k]) < 0 else 1, 1)
        flush_br()
        r = 0
    if r > 0 or br_bits:
        code, ln = ac_tab[0x00]                  # EOB (run of 1)
        bw.bits(code, ln)
        flush_br()
