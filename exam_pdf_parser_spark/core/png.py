"""Minimal, dependency-free PNG codec (8-bit grayscale).

The sandbox ships no raster library, but a valid PNG needs only
``zlib`` + CRC-framed chunks — so the crop sink (S11, reference
src/cropper/cropper.py:73-74) can emit REAL image files any viewer
opens, instead of stubbed bytes.  Encoder writes filter-0 scanlines;
the decoder (tests + library use) handles exactly what the encoder
produces plus filter types 0-2, which is all this repo emits.

Deterministic: fixed zlib level, no timestamps, no ancillary chunks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

PAD = 10.0  # crop padding, reference default src/cropper/cropper.py:64


def pad_clamp(bbox, page_w: float, page_h: float,
              pad: float = PAD) -> tuple[float, float, float, float]:
    """F16: ``max(0, x0-pad) … min(page_w, x1+pad)``
    (src/cropper/cropper.py:64-71).  Lives beside the rasterizer so
    the Spark crop sink and the single-node oracle share ONE copy."""
    x0, y0, x1, y1 = bbox
    return (max(0.0, x0 - pad), max(0.0, y0 - pad),
            min(page_w, x1 + pad), min(page_h, y1 + pad))


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png_gray(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w) uint8 array → PNG bytes (color type 0, bit depth 8,
    filter 0 per scanline)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # prepend the filter byte (0 = None) to every scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img], axis=1).tobytes()
    idat = zlib.compress(raw, compress_level)
    return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png_gray(data: bytes) -> np.ndarray:
    """Parse a grayscale PNG back to (h, w) uint8 — validates the
    signature, chunk CRCs, and header; un-filters types 0/1/2."""
    if data[:8] != PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("scanline size mismatch")
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        filt = raw[y * stride]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=w, offset=y * stride + 1).copy()
        if filt == 0:
            pass
        elif filt == 1:            # Sub
            for x in range(1, w):
                line[x] = (int(line[x]) + int(line[x - 1])) & 0xFF
        elif filt == 2:            # Up
            line = (line.astype(np.uint16) + prev) & 0xFF
            line = line.astype(np.uint8)
        else:
            raise ValueError(f"unsupported filter {filt}")
        out[y] = line
        prev = out[y]
    return out


# deterministic shade per block type — the crop render is a
# rasterization of the layout GEOMETRY (the sandbox has no PDF
# renderer, so there are no source pixels; this is the honest
# deterministic replacement, documented in the crop sink)
BLOCK_SHADES = {"text": 200, "image": 150, "table": 100}
MAX_DIM = 512


def render_region(blocks: list[dict], crop_bbox, scale: float = 1.0,
                  max_dim: int = MAX_DIM) -> np.ndarray:
    """Rasterize the page blocks clipped to ``crop_bbox`` onto a white
    canvas: each intersecting block fills its intersection with a
    per-type shade.  1 px per layout pt, capped at ``max_dim`` on the
    long side (uniform downscale)."""
    x0, y0, x1, y1 = crop_bbox
    w_pt, h_pt = max(x1 - x0, 1.0), max(y1 - y0, 1.0)
    if max(w_pt, h_pt) * scale > max_dim:
        scale = max_dim / max(w_pt, h_pt)
    w = max(1, int(round(w_pt * scale)))
    h = max(1, int(round(h_pt * scale)))
    img = np.full((h, w), 255, dtype=np.uint8)
    for b in blocks:
        bb = b.get("bbox")
        if bb is None:
            continue
        ix0, iy0 = max(bb[0], x0), max(bb[1], y0)
        ix1, iy1 = min(bb[2], x1), min(bb[3], y1)
        if ix0 >= ix1 or iy0 >= iy1:
            continue
        px0 = int(round((ix0 - x0) * scale))
        py0 = int(round((iy0 - y0) * scale))
        px1 = max(px0 + 1, int(round((ix1 - x0) * scale)))
        py1 = max(py0 + 1, int(round((iy1 - y0) * scale)))
        shade = BLOCK_SHADES.get(b.get("type", "text"), 200)
        img[py0:min(py1, h), px0:min(px1, w)] = shade
    return img
