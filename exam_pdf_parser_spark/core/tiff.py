"""Minimal baseline-TIFF codec (stdlib only).

Decodes the TIFF shapes a crawl actually serves for scans: first IFD,
8-bit grayscale or RGB, strip-based, compression **none (1)** or
**PackBits (32773)**, little- or big-endian, photometric 0/1/2.
Tiled TIFF, LZW/JPEG/deflate compression, palettes and multi-page
files raise ``NotImplementedError`` loudly — Spark stages quarantine
per payload.  The encoder writes uncompressed or PackBits grayscale
for self-contained round trips.

Layout reference: the public TIFF 6.0 specification (header II*\\0 /
MM\\0*, IFD tag walk, strip offsets/byte-counts).
"""

from __future__ import annotations

import struct

import numpy as np

TIFF_SIGS = (b"II*\x00", b"MM\x00*")

_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4}


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
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue                    # rationals etc. — not needed
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


def decode_tiff_gray(payload: bytes) -> np.ndarray:
    """Baseline TIFF → (h, w) uint8 gray (RGB averaged to luma mean)."""
    if payload[:4] not in TIFF_SIGS:
        raise ValueError("not a TIFF payload")
    order = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, order)
    try:
        w, h = tags[_W][0], tags[_H][0]
        offs, cnts = tags[_STRIP_OFF], tags[_STRIP_CNT]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    comp = tags.get(_COMP, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])[0]
    photo = tags.get(_PHOTO, [1])[0]
    if bits != 8:
        raise NotImplementedError(f"{bits}-bit TIFF not supported")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"{spp} samples/pixel not supported")
    if comp not in (1, 32773):
        name = {5: "LZW", 6: "old-JPEG", 7: "JPEG", 8: "deflate"}.get(
            comp, str(comp))
        raise NotImplementedError(f"TIFF compression {name} not supported")
    raw = bytearray()
    for off, cnt in zip(offs, cnts):
        strip = payload[off:off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        raw += unpackbits(strip) if comp == 32773 else strip
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("TIFF pixel data shorter than dimensions imply")
    img = np.frombuffer(bytes(raw[:need]), np.uint8).reshape(h, w * spp)
    if spp in (3, 4):
        # RGBA: alpha (extra sample) ignored, RGB averaged to luma mean
        img = img.reshape(h, w, spp)[:, :, :3].mean(axis=2).astype(np.uint8)
    if photo == 0:                       # white-is-zero bilevel/gray
        img = (255 - img).astype(np.uint8)
    return img


def tiff_dims(payload: bytes) -> tuple[int, int] | None:
    """Header-only (w, h) probe; None when not a TIFF."""
    if payload[:4] not in TIFF_SIGS:
        return None
    try:
        order = "<" if payload[:2] == b"II" else ">"
        tags = _read_ifd(payload, order)
        return tags[_W][0], tags[_H][0]
    except Exception:
        return None


def encode_tiff_gray(img: np.ndarray, use_packbits: bool = False) -> bytes:
    """(h, w) uint8 → single-strip little-endian grayscale TIFF."""
    h, w = img.shape
    data = img.astype(np.uint8).tobytes()
    comp = 1
    if use_packbits:
        data, comp = packbits(data), 32773
    entries = [
        (_W, 4, 1, w), (_H, 4, 1, h), (_BITS, 3, 1, 8),
        (_COMP, 3, 1, comp), (_PHOTO, 3, 1, 1),
        (_STRIP_OFF, 4, 1, None),        # patched below
        (_SPP, 3, 1, 1), (_ROWS_PER_STRIP, 4, 1, h),
        (_STRIP_CNT, 4, 1, len(data)),
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
