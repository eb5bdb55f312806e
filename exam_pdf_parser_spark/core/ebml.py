"""EBML (Matroska/WebM) header metadata — stdlib-only element walk.

No sample decode: mkv/webm payloads carry inter-frame codecs (VP8/VP9/
AV1/H.264) with no stdlib implementation, so pixel decode stays
fail-loud in ``operators.multimodal.decode_video``.  This module
closes the METADATA half: DocType from the EBML header, duration from
``Segment/Info`` (TimestampScale × Duration), dimensions and track
kinds from ``Segment/Tracks/TrackEntry`` — against the published
Matroska element registry (public spec; no reference-repo counterpart
exists).

Robustness contract: a non-EBML payload returns None; a truncated or
malformed EBML stream never raises — the walk clamps to the buffer and
reports whatever was parsed.
"""

from __future__ import annotations

import struct

_EBML_MAGIC = b"\x1aE\xdf\xa3"

# element IDs (with marker bits, as they appear on the wire)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_VIDEO = 0xE0
_AUDIO_EL = 0xE1
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA

_TRACK_TYPE_VIDEO = 1
_TRACK_TYPE_AUDIO = 2


def _vint(buf: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer; returns (value, next_pos)
    or (None, pos) on truncation/invalid marker.  Element IDs keep the
    length-marker bit (wire form); sizes clear it."""
    if pos >= len(buf) or buf[pos] == 0:
        return None, pos
    b0 = buf[pos]
    length = 1
    mask = 0x80
    while not (b0 & mask):
        mask >>= 1
        length += 1
    if pos + length > len(buf):
        return None, pos
    val = int.from_bytes(buf[pos:pos + length], "big")
    if not keep_marker:
        val &= (1 << (7 * length)) - 1
        if val == (1 << (7 * length)) - 1:
            val = -1            # all-ones = unknown size (streamed)
    return val, pos + length


def _elements(buf: bytes, pos: int, end: int):
    """Yield ``(element_id, body_start, body_end)`` for the element
    sequence in ``buf[pos:end]``; unknown-size elements extend to the
    container end, truncated bodies clamp to it."""
    while pos < end:
        eid, p = _vint(buf, pos, keep_marker=True)
        if eid is None:
            return
        size, p = _vint(buf, p, keep_marker=False)
        if size is None:
            return
        body_end = end if size < 0 else min(p + size, end)
        yield eid, p, body_end
        pos = body_end


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def ebml_meta(payload: bytes) -> dict | None:
    """Header metadata for an EBML (mkv/webm) payload, or None if the
    payload does not start with the EBML magic.

    Returns ``{doctype, kind, width, height, duration_ms, n_tracks,
    n_video_tracks, n_audio_tracks}``; fields missing from the stream
    stay None/0."""
    if payload[:4] != _EBML_MAGIC:
        return None
    out = {
        "doctype": None, "kind": None, "width": None, "height": None,
        "duration_ms": None, "n_tracks": 0,
        "n_video_tracks": 0, "n_audio_tracks": 0,
    }
    for eid, s, e in _elements(payload, 0, len(payload)):
        if eid == _EBML_HEADER:
            for eid2, s2, e2 in _elements(payload, s, e):
                if eid2 == _DOCTYPE:
                    out["doctype"] = payload[s2:e2].split(b"\x00")[0] \
                        .decode("latin-1")
        elif eid == _SEGMENT:
            for eid2, s2, e2 in _elements(payload, s, e):
                if eid2 == _INFO:
                    tscale, dur = 1_000_000, None   # ns default
                    for eid3, s3, e3 in _elements(payload, s2, e2):
                        if eid3 == _TIMESTAMP_SCALE:
                            tscale = _uint(payload, s3, e3) or tscale
                        elif eid3 == _DURATION and e3 - s3 in (4, 8):
                            fmt = ">f" if e3 - s3 == 4 else ">d"
                            (dur,) = struct.unpack(
                                fmt, payload[s3:e3])
                    if dur is not None and dur >= 0:
                        out["duration_ms"] = int(dur * tscale / 1e6)
                elif eid2 == _TRACKS:
                    for eid3, s3, e3 in _elements(payload, s2, e2):
                        if eid3 != _TRACK_ENTRY:
                            continue
                        out["n_tracks"] += 1
                        for eid4, s4, e4 in _elements(payload, s3, e3):
                            if eid4 == _TRACK_TYPE:
                                t = _uint(payload, s4, e4)
                                if t == _TRACK_TYPE_VIDEO:
                                    out["n_video_tracks"] += 1
                                elif t == _TRACK_TYPE_AUDIO:
                                    out["n_audio_tracks"] += 1
                            elif eid4 == _VIDEO:
                                for eid5, s5, e5 in _elements(
                                        payload, s4, e4):
                                    if eid5 == _PIXEL_WIDTH:
                                        out["width"] = out["width"] or \
                                            _uint(payload, s5, e5)
                                    elif eid5 == _PIXEL_HEIGHT:
                                        out["height"] = out["height"] or \
                                            _uint(payload, s5, e5)
    if out["n_video_tracks"]:
        out["kind"] = "video"
    elif out["n_audio_tracks"]:
        out["kind"] = "audio"
    else:
        out["kind"] = "video"       # Matroska default presentation
    return out
