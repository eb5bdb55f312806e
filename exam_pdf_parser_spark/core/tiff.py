"""Minimal baseline-TIFF codec (stdlib only).

Decodes the TIFF shapes a crawl actually serves for scans: first
IFD, 8-bit grayscale/RGB/RGBA/palette/CMYK/YCbCr (subsampled data
units, ReferenceBlackWhite + tag-529 coefficients honored),
strip-based, compression **none (1)**, **LZW (5)** incl. the
horizontal-differencing predictor, **new-style JPEG (7)** (strips
through ``core/jpeg.py``, shared tag-347 tables spliced), **deflate
(8/32946)** or **PackBits (32773)**, little- or big-endian.  Tiled
TIFF and old-style JPEG raise ``NotImplementedError`` loudly — Spark
stages quarantine per payload.  Multi-page files decode their FIRST
IFD (the Pillow/libtiff default), further pages are ignored.  The encoder writes grayscale in any supported codec
(none/packbits/lzw/deflate, optional predictor) for self-contained
round trips.

Layout reference: the public TIFF 6.0 specification (header II*\\0 /
MM\\0*, IFD tag walk, strip offsets/byte-counts).
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_SIGS = (b"II*\x00", b"MM\x00*")

_W, _H, _BITS, _COMP, _PHOTO, _ORIENT = 256, 257, 258, 259, 262, 274
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR, _COLORMAP, _TILE_W, _TILE_H = 317, 320, 322, 323
_TILE_OFF, _TILE_CNT, _JPEGTABLES = 324, 325, 347
_YCBCR_COEF, _YCBCR_SUBSAMPLING, _REF_BW = 529, 530, 532

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4}


def _read_ifd(buf: bytes, order: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(order + "I", buf, 4)
    if ifd_off + 2 > len(buf):
        raise ValueError("truncated TIFF: IFD offset out of range")
    (n_tags,) = struct.unpack_from(order + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(buf):
            raise ValueError("truncated TIFF: IFD entry out of range")
        tag, typ, cnt = struct.unpack_from(order + "HHI", buf, e)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            off = e + 8
        else:
            (off,) = struct.unpack_from(order + "I", buf, e + 8)
        if typ in (2, 7):               # ASCII / UNDEFINED → raw bytes
            if off + size > len(buf):
                raise ValueError("truncated TIFF: tag value out of range")
            tags[tag] = buf[off:off + size]
            continue
        if typ in (5, 10):              # (S)RATIONAL → float num/den
            if off + size > len(buf):
                raise ValueError("truncated TIFF: tag value out of range")
            f = "I" if typ == 5 else "i"
            pairs = struct.unpack_from(order + f * (2 * cnt), buf, off)
            tags[tag] = [
                (pairs[2 * i] / pairs[2 * i + 1]) if pairs[2 * i + 1]
                else 0.0 for i in range(cnt)]
            continue
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue                    # other types — not needed
        if off + size > len(buf):
            raise ValueError("truncated TIFF: tag value out of range")
        tags[tag] = list(struct.unpack_from(
            order + fmt * cnt, buf, off))
    return tags


def unpackbits(data: bytes) -> bytes:
    """Apple PackBits RLE decode (TIFF compression 32773)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:                     # literal run of c+1 bytes
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                   # repeat next byte 257-c times
            if i < n:
                out += bytes([data[i]]) * (257 - c)
                i += 1
        # c == 128: no-op
    return bytes(out)


def packbits(data: bytes) -> bytes:
    """PackBits encode (literal/replicate runs)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i]
                        and i + 2 < n and data[i + 2] == data[i])):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, codes
    256=CLEAR / 257=EOI, initial width 9, and **early change** — the
    width grows when the table reaches 2^width − 1 (one code earlier
    than GIF's LSB-first variant in ``core/gif.py``)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0

    def reset() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = reset()
    prev: bytes | None = None
    while len(out) < max_out:
        while nbits < width and pos < len(data):
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits < width:
            break                        # stream end without EOI
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1          # keep the accumulator small
        if code == CLEAR:
            table, width = reset()
            prev = None
            continue
        if code == EOI:
            break
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]      # the KwKwK case
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # early change, one-behind compensated: the decoder's table
        # lags the encoder by one entry, so it must widen after entry
        # 2^w−2 to read the encoder's first (2^w−1)-era code correctly
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    return bytes(out[:max_out])


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (round-trip twin of ``lzw_decode``)."""
    CLEAR, EOI = 256, 257
    bits = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            bits.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1                   # early change, encoder side
        if next_code >= 4094:            # leave room, then reset
            emit(CLEAR, width)
            table, next_code, width = fresh()
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        bits.append((acc << (8 - nbits)) & 0xFF)
    return bytes(bits)


def decode_tiff_gray(payload: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w) uint8 gray (RGB averaged to luma mean)."""
    if payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    order = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, order)
    try:
        w, h = tags[_W][0], tags[_H][0]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    tiled = _TILE_W in tags and _TILE_H in tags
    if tiled:
        offs, cnts = tags.get(_TILE_OFF), tags.get(_TILE_CNT)
    else:
        offs, cnts = tags.get(_STRIP_OFF), tags.get(_STRIP_CNT)
    if offs is None or cnts is None:
        raise ValueError("TIFF missing strip/tile offset tags")
    comp = tags.get(_COMP, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])[0]
    photo = tags.get(_PHOTO, [1])[0]
    if comp == 7:
        # new-style JPEG-in-TIFF: every strip is a JPEG bitstream
        # (possibly abbreviated, sharing tables via tag 347) — the
        # JPEG codec owns bit depth and colorspace, so none of the
        # guards below apply
        if tiled:
            raise NotImplementedError("tiled JPEG TIFF not supported")
        return _apply_orientation(
            _decode_jpeg_strips(payload, tags, w, h, offs, cnts),
            tags.get(_ORIENT, [1])[0])
    if comp == 6:
        # old-style JPEG (TIFF 6.0 §22, long-deprecated): the tag-soup
        # form stays unsupported, but the common writer bug stores a
        # complete JPEG stream at the first strip offset (frequently
        # with a wrong byte count, so read to EOF) — decode that
        # shape; anything else stays loud
        blob = payload[offs[0]:] if offs else b""
        if blob[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg_gray

            img = decode_jpeg_gray(bytes(blob))
            if img.shape[0] < h or img.shape[1] < w:
                raise ValueError("old-JPEG TIFF stream smaller than "
                                 "the declared dimensions")
            return _apply_orientation(
                np.ascontiguousarray(img[:h, :w]),
                tags.get(_ORIENT, [1])[0])
        raise NotImplementedError(
            "TIFF compression old-JPEG without an embedded JPEG "
            "stream not supported")
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit TIFF not supported")
    if bits == 16 and (photo not in (0, 1) or spp != 1):
        # 16-bit is the deep-grayscale scan shape; 16-bit color would
        # need per-photometric rescale rules
        raise NotImplementedError("16-bit TIFF only supported for "
                                  "single-sample grayscale")
    if photo == 3 and _COLORMAP not in tags:
        raise ValueError("palette TIFF without a ColorMap tag")
    if photo not in (0, 1, 2, 3, 5, 6):
        raise NotImplementedError(
            f"TIFF photometric {photo} not supported")
    if photo == 5 and spp != 4:
        raise ValueError(f"CMYK TIFF with {spp} samples/pixel")
    if photo == 6 and spp != 3:
        raise ValueError(f"YCbCr TIFF with {spp} samples/pixel")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"{spp} samples/pixel not supported")
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    if photo == 6 and tags.get(_PREDICTOR, [1])[0] == 2:
        # differencing across subsampled data units is ill-defined
        raise NotImplementedError("predictor on YCbCr TIFF not supported")
    sh = sv = 1
    if photo == 6:
        sub = tags.get(_YCBCR_SUBSAMPLING, [2, 2])
        sh, sv = (sub + [sub[0]])[:2]
        if sh not in (1, 2, 4) or sv not in (1, 2, 4) or sv > sh:
            raise ValueError(f"YCbCr subsampling {sh}x{sv} invalid")

    bpp = bits // 8
    dt = np.uint8 if bits == 8 else np.dtype(f"{order}u2")
    pred2 = tags.get(_PREDICTOR, [1])[0] == 2
    mask = (1 << bits) - 1

    def inflate(blob: bytes, expected: int) -> bytes:
        if comp == 32773:
            return unpackbits(blob)
        if comp == 5:
            return lzw_decode(blob, expected)
        if comp in (8, 32946):           # (Adobe-)deflate = zlib
            import zlib

            return zlib.decompress(blob)
        return blob

    def undo_pred(px: np.ndarray) -> np.ndarray:
        # horizontal differencing: per-row running sum per channel
        return (np.cumsum(px, axis=1, dtype=np.uint64) & mask) \
            .astype(px.dtype)

    if tiled:
        if photo == 6:
            raise NotImplementedError("tiled YCbCr TIFF not supported")
        tw, tl = tags[_TILE_W][0], tags[_TILE_H][0]
        if not tw or not tl:
            raise ValueError("TIFF tile dimensions zero")
        ta, td = -(-w // tw), -(-h // tl)
        if len(offs) < ta * td or len(cnts) < ta * td:
            raise ValueError("TIFF tile table shorter than the grid")
        tile_need = tw * tl * spp * bpp
        canvas = np.zeros((h, w, spp), dt)
        for ti in range(td):
            for tj in range(ta):
                idx = ti * ta + tj
                blob = payload[offs[idx]:offs[idx] + cnts[idx]]
                if len(blob) != cnts[idx]:
                    raise ValueError("truncated TIFF tile")
                traw = inflate(bytes(blob), tile_need)
                if len(traw) < tile_need:
                    raise ValueError("TIFF tile shorter than its "
                                     "dimensions imply")
                t = np.frombuffer(traw[:tile_need], dt) \
                    .reshape(tl, tw, spp)
                if pred2:                # differencing restarts per tile
                    t = undo_pred(t)
                y0, x0 = ti * tl, tj * tw
                ny, nx = min(tl, h - y0), min(tw, w - x0)
                canvas[y0:y0 + ny, x0:x0 + nx] = t[:ny, :nx]
        img = canvas.reshape(h, w * spp)
    else:

        def strip_bytes(n_rows: int) -> int:
            if photo == 6:               # rows of (sh*sv Y + Cb + Cr)
                return (-(-n_rows // sv)) * (-(-w // sh)) * (sh * sv + 2)
            return n_rows * w * spp * bpp

        rows_per = tags.get(_ROWS_PER_STRIP, [h])[0] or h
        if photo == 6 and len(offs) > 1 and rows_per % sv:
            # each strip must hold whole data-unit rows, or the
            # per-strip padding rows would shift every later strip
            raise ValueError("YCbCr RowsPerStrip not a multiple of "
                             "the vertical subsampling")
        raw = bytearray()
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            strip = payload[off:off + cnt]
            if len(strip) != cnt:
                raise ValueError("truncated TIFF strip")
            n_rows = min(rows_per, h - i * rows_per)
            raw += inflate(strip, strip_bytes(n_rows))
        if photo == 6:
            return _apply_orientation(
                _ycbcr_to_gray(bytes(raw), w, h, sh, sv, tags),
                tags.get(_ORIENT, [1])[0])
        need = w * h * spp * bpp
        if len(raw) < need:
            raise ValueError("TIFF pixel data shorter than dimensions "
                             "imply")
        img = np.frombuffer(bytes(raw[:need]), dt).reshape(h, w * spp)
        if pred2:
            img = undo_pred(img.reshape(h, w, spp)).reshape(h, w * spp)
    if bits == 16:                       # deep gray → high byte
        img = (img >> 8).astype(np.uint8)
    if photo == 5:
        # CMYK inks (0 = no ink): R=(255-C)(255-K)/255 etc; gray is
        # the channel mean, matching the RGB branch's convention
        ink = img.reshape(h, w, 4).astype(np.float64)
        cmy, k = ink[:, :, :3], ink[:, :, 3:4]
        rgb = (255.0 - cmy) * (255.0 - k) / 255.0
        img = np.clip(rgb.mean(axis=2) + 0.5, 0, 255).astype(np.uint8)
    elif spp in (3, 4):
        # RGBA: alpha (extra sample) ignored, RGB averaged to luma mean
        img = img.reshape(h, w, spp)[:, :, :3].mean(axis=2).astype(np.uint8)
    if photo == 3:
        # palette: ColorMap holds 2^bits 16-bit reds, then greens,
        # then blues — map indices through the channel-mean gray LUT
        cmap = np.asarray(tags[_COLORMAP], np.uint32)
        n = len(cmap) // 3
        if n < 256:
            raise ValueError("TIFF ColorMap shorter than index range")
        lut = ((cmap[:n] + cmap[n:2 * n] + cmap[2 * n:3 * n]) // 3
               >> 8).astype(np.uint8)
        img = lut[img]
    if photo == 0:                       # white-is-zero bilevel/gray
        img = (255 - img).astype(np.uint8)
    return _apply_orientation(img, tags.get(_ORIENT, [1])[0])


def _apply_orientation(img: np.ndarray, o: int) -> np.ndarray:
    """Tag 274: map stored rows/cols to visual orientation (TIFF 6.0
    §Orientation; 5-8 transpose, so width and height swap)."""
    if o in (0, 1):
        return img
    if o == 2:                           # mirrored horizontally
        out = img[:, ::-1]
    elif o == 3:                         # rotated 180
        out = img[::-1, ::-1]
    elif o == 4:                         # mirrored vertically
        out = img[::-1, :]
    elif o == 5:                         # transposed (TL-BR diagonal)
        out = img.T
    elif o == 6:                         # rotate 90 clockwise to view
        out = img.T[:, ::-1]
    elif o == 7:                         # transverse (TR-BL diagonal)
        out = img.T[::-1, ::-1]
    elif o == 8:                         # rotate 90 counter-clockwise
        out = img.T[::-1, :]
    else:
        raise ValueError(f"TIFF orientation {o} invalid")
    return np.ascontiguousarray(out)


def _ycbcr_to_gray(raw: bytes, w: int, h: int, sh: int, sv: int,
                   tags: dict) -> np.ndarray:
    """Photometric-6 data units → gray.  Units interleave sh*sv Y
    samples (row-major) with one Cb and one Cr (TIFF 6.0 §21);
    chroma is nearest-neighbor upsampled, headroom/footroom undone
    via ReferenceBlackWhite (tag 532, default [0,255,128,255,128,
    255]) and RGB recovered with the tag-529 luma coefficients
    (default BT.601), then channel-mean gray like the RGB branch."""
    ucols, urows = -(-w // sh), -(-h // sv)
    unit = sh * sv + 2
    need = ucols * urows * unit
    if len(raw) < need:
        raise ValueError("TIFF pixel data shorter than dimensions imply")
    arr = np.frombuffer(raw[:need], np.uint8).reshape(urows, ucols, unit)
    ys = arr[:, :, : sh * sv].reshape(urows, ucols, sv, sh)
    y = ys.transpose(0, 2, 1, 3).reshape(urows * sv, ucols * sh)
    y = y[:h, :w].astype(np.float64)
    cb = np.repeat(np.repeat(arr[:, :, sh * sv], sv, 0), sh, 1)
    cr = np.repeat(np.repeat(arr[:, :, sh * sv + 1], sv, 0), sh, 1)
    cb = cb[:h, :w].astype(np.float64)
    cr = cr[:h, :w].astype(np.float64)
    ref = tags.get(_REF_BW, [0.0, 255.0, 128.0, 255.0, 128.0, 255.0])
    if len(ref) != 6 or ref[1] <= ref[0] or ref[3] <= ref[2] \
            or ref[5] <= ref[4]:
        raise ValueError("TIFF ReferenceBlackWhite malformed")
    y = (y - ref[0]) * (255.0 / (ref[1] - ref[0]))
    cb = (cb - ref[2]) * (127.0 / (ref[3] - ref[2]))
    cr = (cr - ref[4]) * (127.0 / (ref[5] - ref[4]))
    lr, lg, lb = tags.get(_YCBCR_COEF, [0.299, 0.587, 0.114])
    if not lg:
        raise ValueError("TIFF YCbCrCoefficients with zero green weight")
    r = y + cr * (2.0 - 2.0 * lr)
    b = y + cb * (2.0 - 2.0 * lb)
    g = (y - lr * r - lb * b) / lg
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb.mean(axis=2) + 0.5, 0, 255).astype(np.uint8)


def _decode_jpeg_strips(payload: bytes, tags: dict, w: int, h: int,
                        offs: list[int], cnts: list[int]) -> np.ndarray:
    """Compression-7 strips → stacked luma plane via ``core/jpeg.py``.
    Abbreviated strips get the shared JPEGTables (tag 347) spliced in
    after their SOI; duplicate table definitions are legal (the later
    one wins), so full streams pass through the splice unchanged."""
    from .jpeg import decode_jpeg_gray

    tables = tags.get(_JPEGTABLES)
    if tables is not None and (
            tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9"):
        raise ValueError("JPEGTables without SOI/EOI framing")
    strips = []
    for off, cnt in zip(offs, cnts):
        blob = payload[off:off + cnt]
        if len(blob) != cnt:
            raise ValueError("truncated TIFF strip")
        if blob[:2] != b"\xff\xd8":
            raise ValueError("JPEG strip without SOI")
        if tables is not None and len(tables) > 4:
            blob = tables[:-2] + blob[2:]
        strips.append(decode_jpeg_gray(bytes(blob)))
    if any(s.shape[1] < w for s in strips):
        raise ValueError("JPEG strip narrower than the TIFF width")
    img = np.vstack([s[:, :w] for s in strips])
    if img.shape[0] < h:
        raise ValueError("JPEG strips shorter than the TIFF height")
    return np.ascontiguousarray(img[:h])


def tiff_dims(payload: bytes) -> tuple[int, int] | None:
    """Header-only (w, h) probe; None when not a TIFF."""
    if payload[:4] not in TIFF_SIGS:
        return None
    try:
        order = "<" if payload[:2] == b"II" else ">"
        tags = _read_ifd(payload, order)
        w, h = tags[_W][0], tags[_H][0]
        if tags.get(_ORIENT, [1])[0] in (5, 6, 7, 8):
            w, h = h, w                  # transposing orientations
        return w, h
    except Exception:
        return None


def encode_tiff_gray(img: np.ndarray, use_packbits: bool = False,
                     codec: str | None = None,
                     predictor: int = 1) -> bytes:
    """(h, w) uint8 → single-strip little-endian grayscale TIFF.
    ``codec``: none | packbits | lzw; ``predictor=2`` applies
    horizontal differencing before compression (the libtiff default
    pairing with LZW)."""
    h, w = img.shape
    codec = codec or ("packbits" if use_packbits else "none")
    px = img.astype(np.uint8)
    if predictor == 2:
        d = px.astype(np.int16)
        d[:, 1:] -= px[:, :-1].astype(np.int16)
        px = (d & 0xFF).astype(np.uint8)
    data = px.tobytes()
    comp = {"none": 1, "packbits": 32773, "lzw": 5, "deflate": 8}[codec]
    if codec == "packbits":
        data = packbits(data)
    elif codec == "lzw":
        data = lzw_encode(data)
    elif codec == "deflate":
        import zlib

        data = zlib.compress(data)
    entries = [
        (_W, 4, 1, w), (_H, 4, 1, h), (_BITS, 3, 1, 8),
        (_COMP, 3, 1, comp), (_PHOTO, 3, 1, 1),
        (_STRIP_OFF, 4, 1, None),        # patched below
        (_SPP, 3, 1, 1), (_ROWS_PER_STRIP, 4, 1, h),
        (_STRIP_CNT, 4, 1, len(data)),
        (_PREDICTOR, 3, 1, predictor),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == _STRIP_OFF:
            val = data_off
        out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)          # no next IFD
    out += data
    return bytes(out)
