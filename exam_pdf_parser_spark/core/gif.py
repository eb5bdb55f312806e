"""Minimal, dependency-free GIF codec (grayscale, first frame).

Companion to ``core/png.py``: the sandbox ships no raster library, so
real-format support is stdlib-only.  The decoder implements the full
GIF87a/89a container walk (logical screen descriptor, global/local
color tables, extension skip) and REAL variable-width LZW with
dictionary growth and CLEAR handling — it decodes any baseline
single-frame GIF, not just this module's own output.  Pixels map to
grayscale via integer BT.601 luma on the palette.

The encoder writes valid GIF87a using the classic uncompressed-LZW
technique (one literal code per pixel, CLEAR emitted before the code
width would grow) — byte-deterministic, viewer-openable, and a
round-trip source for the decoder tests.

Interlaced images deinterlace via the standard 4-pass row order;
animation stays out of scope (first frame only).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")


# --- encoder -------------------------------------------------------------------

def encode_gif_gray(img: np.ndarray) -> bytes:
    """(h, w) uint8 array → single-frame grayscale GIF87a bytes."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8 array")
    h, w = img.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])          # GCT present, 256 entries, 8bpp
    for v in range(256):                # grayscale palette r=g=b=v
        out += bytes((v, v, v))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += b"\x08"                      # LZW minimum code size
    out += _lzw_uncompressed(img.tobytes())
    out += b"\x3b"
    return bytes(out)


def _lzw_uncompressed(data: bytes) -> bytes:
    """LZW stream of pure literal codes: CLEAR, ≤254 literals, repeat —
    the code width stays 9 bits because the dictionary never fills."""
    CLEAR, END = 256, 257
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(CLEAR)
    for i, b in enumerate(data):
        if i and i % 254 == 0:
            emit(CLEAR)
        emit(b)
    emit(END)
    if nbits:
        bits.append(acc & 0xFF)
    # chop into ≤255-byte sub-blocks, zero terminator
    out = bytearray()
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


# --- decoder -------------------------------------------------------------------

def _pal_luma(table: bytes) -> np.ndarray:
    pal = np.frombuffer(table, dtype=np.uint8).reshape(-1, 3)
    return ((pal[:, 0].astype(np.uint32) * 299
             + pal[:, 1].astype(np.uint32) * 587
             + pal[:, 2].astype(np.uint32) * 114) // 1000
            ).astype(np.uint8)


def _iter_gif_frames(payload: bytes):
    """Yield every image descriptor as
    (left, top, luma_subrect, transparent_mask_or_None, disposal) plus
    the screen header first: the generator's first yield is
    ('screen', sw, sh, bg_luma_or_None)."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    pos = 6
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", payload[pos:pos + 7])
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    bg_luma = None
    if gct is not None and bg < len(gct) // 3:
        bg_luma = int(_pal_luma(gct)[bg])
    yield ("screen", sw, sh, bg_luma)

    disposal, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:               # trailer
            break
        if block == 0x21:               # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                gflags = payload[pos + 1]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[pos + 4] if gflags & 1 else None
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack(
            "<HHHHB", payload[pos:pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:               # local color table
            n = 2 << (iflags & 0x07)
            table = payload[pos:pos + 3 * n]
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            stream += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(bytes(stream), min_code, w * h),
            dtype=np.uint8)
        img = _pal_luma(table)[idx].reshape(h, w)
        mask = (idx.reshape(h, w) == transparent) \
            if transparent is not None else None
        if iflags & 0x40:               # 4-pass interlace row order
            order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                     + [*range(2, h, 4)] + [*range(1, h, 2)])
            out = np.empty_like(img)
            out[order] = img
            img = out
            if mask is not None:
                m2 = np.empty_like(mask)
                m2[order] = mask
                mask = m2
        yield (left, top, img, mask, disposal)
        disposal, transparent = 0, None   # GCE applies to ONE image


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """First frame of a GIF → (h, w) uint8 grayscale (BT.601 luma),
    the frame's own subrectangle (no canvas compositing)."""
    it = _iter_gif_frames(payload)
    next(it)                             # screen header
    for _left, _top, img, _mask, _disp in it:
        return img
    raise ValueError("GIF contains no image block")


def decode_gif_frames(payload: bytes,
                      max_frames: int | None = None) -> list[np.ndarray]:
    """Animated GIF → full-canvas luma frames with compositing:
    subrectangles paste at their offsets, transparent pixels keep the
    previous canvas, disposal 2 restores the background in the frame
    rect and disposal 3 restores the pre-frame canvas.  The canvas
    starts at the background color (0 when the header names none)."""
    it = _iter_gif_frames(payload)
    _tag, sw, sh, bg_luma = next(it)
    canvas = np.full((sh, sw), bg_luma or 0, dtype=np.uint8)
    frames: list[np.ndarray] = []
    for left, top, img, mask, disposal in it:
        h, w = img.shape
        # clamp to the logical screen: a frame placed partly or fully
        # outside it contributes only its intersection (a fully-off
        # frame still emits the unchanged canvas)
        b, r = max(top, min(top + h, sh)), max(left, min(left + w, sw))
        prev = canvas.copy() if disposal == 3 else None
        if b > top and r > left:
            sub = img[: b - top, : r - left]
            region = canvas[top:b, left:r]
            if mask is not None:
                m = mask[: b - top, : r - left]
                region[~m] = sub[~m]
            else:
                region[:] = sub
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top:b, left:r] = bg_luma or 0
        elif disposal == 3 and prev is not None:
            canvas = prev
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


def gif_frame_count(payload: bytes) -> int | None:
    """Count image descriptors by walking the block stream (local
    color tables and LZW sub-blocks skipped, never decoded).  Returns
    None for a truncated/blockless stream."""
    try:
        flags = payload[10]
        pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
        count = 0
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:            # trailer
                break
            if block == 0x21:            # extension
                pos += 1
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif block == 0x2C:          # image descriptor
                count += 1
                lflags = payload[pos + 8]
                pos += 9
                if lflags & 0x80:
                    pos += 3 * (2 << (lflags & 7))
                pos += 1                 # LZW min code size
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            else:
                break                    # desynchronized stream
        return count or None
    except IndexError:
        return None


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytes:
    """Variable-width GIF LZW: dictionary growth 2^min_code+2 → 4096,
    CLEAR resets, END stops.  Returns exactly ``n_pixels`` bytes."""
    CLEAR = 1 << min_code
    END = CLEAR + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0

    def reset() -> tuple[list[bytes], int]:
        return ([bytes([i]) for i in range(CLEAR)] + [b"", b""],
                min_code + 1)

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == CLEAR:
            table, width = reset()
            prev = None
            continue
        if code == END:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]     # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data shorter than descriptor")
    return bytes(out[:n_pixels])
