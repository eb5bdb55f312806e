"""Minimal BMP codec (stdlib only): 1/4/8-bit palette (uncompressed,
BI_RLE4 or BI_RLE8), 16-bit (RGB555 or BI_BITFIELDS), 24-bit, and
32-bit (BI_RGB or BI_BITFIELDS channel masks) Windows bitmaps with
BITMAPINFOHEADER-family headers, plus the OS/2 BITMAPCOREHEADER
(uint16 dims, RGB-triple palette).  Bottom-up or top-down rows,
4-byte row padding.  Layout reference: the public BMP file-format
description."""

from __future__ import annotations

import struct

import numpy as np

BMP_SIG = b"BM"


def bmp_dims(payload: bytes) -> tuple[int, int] | None:
    """Header-only (w, |h|) probe; None when not a BMP.  Handles both
    BITMAPINFOHEADER-family (int32 dims at 18) and the OS/2
    BITMAPCOREHEADER (uint16 dims at 18)."""
    if payload[:2] != BMP_SIG or len(payload) < 26:
        return None
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size == 12:                   # BITMAPCOREHEADER
        w, h = struct.unpack_from("<HH", payload, 18)
        return w, h
    if hdr_size < 40:                    # unknown header shape
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    return w, abs(h)


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 → (h, w) uint8 index rows (file row order, bottom-up
    like the uncompressed layout).  Escapes: 0,0=end-of-line,
    0,1=end-of-bitmap, 0,2=delta (skipped cells stay 0), 0,n≥3 =
    absolute run of n literal bytes (word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    row = col = 0
    i, n = 0, len(data)
    while i + 1 < n and row < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:                          # encoded run
            end = min(col + cnt, w)
            out[row, col:end] = val
            col = end
            continue
        if val == 0:                     # end of line
            row += 1
            col = 0
        elif val == 1:                   # end of bitmap
            break
        elif val == 2:                   # delta jump
            if i + 1 >= n:
                break
            col = min(col + data[i], w)
            row += data[i + 1]
            i += 2
        else:                            # absolute mode
            run = data[i:i + val]
            end = min(col + len(run), w)
            out[row, col:end] = np.frombuffer(
                run[: end - col], np.uint8)
            col = end
            i += val + (val & 1)         # word-aligned
    return out


def _decode_rle4(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE4 → (h, w) uint8 index rows.  Same escape codes as RLE8;
    an encoded run of cnt pixels ALTERNATES between the high and low
    nibble of val, and absolute mode packs its literals two per byte
    (consumed byte count word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    row = col = 0
    i, n = 0, len(data)
    while i + 1 < n and row < h:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:                          # encoded run: hi,lo,hi,lo,...
            end = min(col + cnt, w)
            pair = np.array([val >> 4, val & 0x0F], np.uint8)
            out[row, col:end] = np.resize(pair, end - col)
            col = end
            continue
        if val == 0:                     # end of line
            row += 1
            col = 0
        elif val == 1:                   # end of bitmap
            break
        elif val == 2:                   # delta jump
            if i + 1 >= n:
                break
            col = min(col + data[i], w)
            row += data[i + 1]
            i += 2
        else:                            # absolute mode, nibble-packed
            nbytes = (val + 1) // 2
            raw = np.frombuffer(data[i:i + nbytes], np.uint8)
            nibs = np.empty(raw.size * 2, np.uint8)
            nibs[0::2] = raw >> 4
            nibs[1::2] = raw & 0x0F
            end = min(col + min(val, nibs.size), w)
            out[row, col:end] = nibs[: end - col]
            col = end
            i += nbytes + (nbytes & 1)   # word-aligned
    return out


def _unpack_indices(rows: np.ndarray, bits: int, w: int) -> np.ndarray:
    """Padded row bytes → (h, w) palette indices for 1/4/8-bit rows."""
    if bits == 8:
        return rows[:, :w]
    if bits == 4:
        nibs = np.empty((rows.shape[0], rows.shape[1] * 2), np.uint8)
        nibs[:, 0::2] = rows >> 4
        nibs[:, 1::2] = rows & 0x0F
        return nibs[:, :w]
    # bits == 1: MSB-first within each byte
    bit = np.unpackbits(rows, axis=1)
    return bit[:, :w]


def decode_bmp_gray(payload: bytes) -> np.ndarray:
    """BMP → (h, w) uint8 gray (24-bit BGR averaged; 8-bit mapped
    through its palette's channel mean)."""
    if payload[:2] != BMP_SIG or len(payload) < 26:
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    core = hdr_size == 12                # OS/2 BITMAPCOREHEADER
    if core:
        w, h = struct.unpack_from("<HH", payload, 18)
        planes, bits = struct.unpack_from("<HH", payload, 22)
        comp = 0                         # core header has no comp field
        pal_entry = 3                    # RGB triples, no reserved byte
        n_colors_field = 0
    else:
        if hdr_size < 40:
            raise ValueError(f"unknown BMP header size {hdr_size}")
        if len(payload) < 54:
            raise ValueError("truncated BMP info header")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bits = struct.unpack_from("<HH", payload, 26)
        (comp,) = struct.unpack_from("<I", payload, 30)
        pal_entry = 4
        n_colors_field = struct.unpack_from("<I", payload, 46)[0]
    # 1 = BI_RLE8, 2 = BI_RLE4, 3 = BI_BITFIELDS
    if comp not in (0, 1, 2, 3):
        raise NotImplementedError(f"BMP compression {comp} not supported")
    if bits not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(f"{bits}-bit BMP not supported")
    if comp == 3 and bits not in (16, 32):
        raise NotImplementedError(
            "BI_BITFIELDS only supported for 16/32-bit")
    if comp == 1 and bits != 8:
        raise NotImplementedError("BI_RLE8 requires 8-bit pixels")
    if comp == 2 and bits != 4:
        raise NotImplementedError("BI_RLE4 requires 4-bit pixels")
    top_down = h < 0
    h = abs(h)
    pal_bits = bits                      # palette size follows the DEPTH
    row_bytes = ((w * bits + 7) // 8 + 3) & ~3
    if comp in (1, 2):
        rle = payload[data_off:]
        if len(rle) < 2:
            raise ValueError(f"BMP RLE{8 if comp == 1 else 4} stream "
                             "missing or empty")
        rows = (_decode_rle8 if comp == 1 else _decode_rle4)(rle, w, h)
        row_bytes = w                    # RLE output is unpadded indices
        bits = 8                         # and already one index per cell
    else:
        need = row_bytes * h
        if data_off + need > len(payload):
            raise ValueError("BMP pixel data shorter than dimensions imply")
        rows = np.frombuffer(
            payload, np.uint8, count=need, offset=data_off).reshape(
            h, row_bytes)
    if bits == 16:
        # RGB555 by default, or BI_BITFIELDS channel masks
        words = rows[:, : w * 2].reshape(h, w, 2)
        words = (words[:, :, 0].astype(np.uint32)
                 | (words[:, :, 1].astype(np.uint32) << 8))
        if comp == 3 and len(payload) >= 66:
            masks = struct.unpack_from("<III", payload, 54)
        else:
            masks = (0x7C00, 0x03E0, 0x001F)
        chans = []
        for m in masks:
            if not m:
                chans.append(np.zeros_like(words, np.float64))
                continue
            shift = (m & -m).bit_length() - 1
            span = (m >> shift)          # scale to 0..255 range
            chans.append(((words & m) >> shift).astype(np.float64)
                         * (255.0 / span))
        img = (sum(chans) / 3.0).astype(np.uint8)
    elif bits == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        img = px.mean(axis=2).astype(np.uint8)
    elif bits == 32:
        # BGRA (BI_RGB) or masked (BI_BITFIELDS); per-channel masks
        # live right after the info header (or inside a V4+ header at
        # the same offset) — shift each channel down by its mask
        px = rows[:, : w * 4].reshape(h, w, 4)
        words = (px[:, :, 0].astype(np.uint32)
                 | (px[:, :, 1].astype(np.uint32) << 8)
                 | (px[:, :, 2].astype(np.uint32) << 16)
                 | (px[:, :, 3].astype(np.uint32) << 24))
        if comp == 3 and len(payload) >= 66:
            # masks sit at file offset 54 both for INFOHEADER+BI_BITFIELDS
            # (appended) and V4/V5 headers (embedded at the same spot)
            masks = struct.unpack_from("<III", payload, 54)
        else:
            masks = (0x00FF0000, 0x0000FF00, 0x000000FF)
        chans = []
        for m in masks:
            if not m:
                chans.append(np.zeros_like(words))
                continue
            shift = (m & -m).bit_length() - 1
            chans.append((words & m) >> shift)
        img = (sum(c.astype(np.float64) for c in chans) / 3.0) \
            .astype(np.uint8)
    else:                                # 1/4/8-bit palette indices
        pal_off = 14 + hdr_size
        n_colors = n_colors_field or (1 << pal_bits)
        if pal_off + n_colors * pal_entry > len(payload):
            raise ValueError("BMP palette shorter than header implies")
        pal = np.frombuffer(
            payload, np.uint8, count=n_colors * pal_entry,
            offset=pal_off).reshape(n_colors, pal_entry)[:, :3]
        gray_lut = np.zeros(256, np.uint8)
        gray_lut[:n_colors] = pal.mean(axis=1).astype(np.uint8)
        idx = (rows[:, :w] if comp in (1, 2)
               else _unpack_indices(rows, bits, w))
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP palette index out of range")
        img = gray_lut[idx]
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp_gray(img: np.ndarray) -> bytes:
    """(h, w) uint8 → 8-bit grayscale-palette BMP (bottom-up)."""
    h, w = img.shape
    row_bytes = (w + 3) & ~3
    pal = b"".join(struct.pack("<BBBB", i, i, i, 0) for i in range(256))
    data_off = 14 + 40 + len(pal)
    body = bytearray()
    for row in img[::-1]:
        body += row.astype(np.uint8).tobytes().ljust(row_bytes, b"\x00")
    size = data_off + len(body)
    return (b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                          len(body), 2835, 2835, 256, 0)
            + pal + bytes(body))
