"""ISO BMFF (MP4/MOV/3GP/M4A) header metadata — stdlib-only box walk.

No sample decode: BMFF video payloads need inter-frame codecs
(H.264/HEVC/AV1) with no stdlib implementation, so pixel decode stays
fail-loud in ``operators.multimodal.decode_video``.  This module closes
the METADATA half the way the WebP/MP3/Ogg headers were closed —
dimensions from ``trak/tkhd``, duration from ``moov/mvhd``, per-track
handler kinds from ``trak/mdia/hdlr`` — against the published ISO
14496-12 box layout (public spec; no reference-repo counterpart
exists: /root/reference contains no media parsing at all).

Robustness contract (shared with core/{tiff,bmp,audio}.py): a
non-BMFF payload returns None; a BMFF payload that is truncated or
inconsistent never raises — the walk stops at the first malformed box
and reports whatever was parsed, with ``complete=False``.
"""

from __future__ import annotations

_U32_MAX = 0xFFFFFFFF
_U64_MAX = 0xFFFFFFFFFFFFFFFF

# brands that identify audio-only BMFF files even without an hdlr walk
_AUDIO_BRANDS = {"M4A ", "M4B ", "M4P "}


def _boxes(buf: bytes, start: int, end: int):
    """Yield ``(fourcc, body_start, body_end)`` for the box sequence in
    ``buf[start:end]``; stops (without raising) at the first malformed
    or truncated box header."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        fourcc = buf[pos + 4:pos + 8]
        header = 8
        if size == 1:                       # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            header = 16
        elif size == 0:                     # box extends to container end
            size = end - pos
        if size < header or pos + size > end:
            return                          # corrupt/truncated: stop
        yield fourcc, pos + header, pos + size
        pos += size


def mp4_meta(payload: bytes) -> dict | None:
    """Header metadata for an ISO BMFF payload, or None if the payload
    is not BMFF (no ``ftyp`` box at the head).

    Returns ``{brand, kind, width, height, duration_ms, timescale,
    n_tracks, n_video_tracks, n_audio_tracks, complete}`` —
    ``complete`` is False when no ``moov`` was found (init segment /
    truncated progressive file), in which case dims/duration are None.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    out = {
        "brand": payload[8:12].decode("latin-1"),
        "kind": None, "width": None, "height": None,
        "duration_ms": None, "timescale": None,
        "n_tracks": 0, "n_video_tracks": 0, "n_audio_tracks": 0,
        "complete": False,
    }
    for fourcc, s, e in _boxes(payload, 0, len(payload)):
        if fourcc != b"moov":
            continue
        out["complete"] = True
        for f2, s2, e2 in _boxes(payload, s, e):
            if f2 == b"mvhd" and e2 - s2 >= 20:
                ver = payload[s2]
                if ver == 1 and e2 - s2 >= 32:
                    ts = int.from_bytes(payload[s2 + 20:s2 + 24], "big")
                    dur = int.from_bytes(payload[s2 + 24:s2 + 32], "big")
                    unknown = dur == _U64_MAX
                else:
                    ts = int.from_bytes(payload[s2 + 12:s2 + 16], "big")
                    dur = int.from_bytes(payload[s2 + 16:s2 + 20], "big")
                    unknown = dur == _U32_MAX
                out["timescale"] = ts or None
                if ts and not unknown:
                    out["duration_ms"] = dur * 1000 // ts
            elif f2 == b"trak":
                out["n_tracks"] += 1
                for f3, s3, e3 in _boxes(payload, s2, e2):
                    if f3 == b"tkhd" and e3 - s3 >= 24:
                        ver = payload[s3]
                        # after version/flags(4): v0 packs times/id/
                        # reserved/duration in 20 bytes, v1 in 32; then
                        # reserved(8) layer(2) alt_group(2) volume(2)
                        # reserved(2) matrix(36) precede the 16.16
                        # fixed-point width/height
                        p = s3 + 4 + (32 if ver == 1 else 20) + 52
                        if p + 8 <= e3:
                            w = int.from_bytes(payload[p:p + 4], "big") >> 16
                            h = int.from_bytes(
                                payload[p + 4:p + 8], "big") >> 16
                            if w and h:     # audio tracks carry 0×0
                                out["width"] = out["width"] or w
                                out["height"] = out["height"] or h
                    elif f3 == b"mdia":
                        for f4, s4, e4 in _boxes(payload, s3, e3):
                            if f4 == b"hdlr" and e4 - s4 >= 12:
                                handler = payload[s4 + 8:s4 + 12]
                                if handler == b"vide":
                                    out["n_video_tracks"] += 1
                                elif handler == b"soun":
                                    out["n_audio_tracks"] += 1
    if out["n_video_tracks"]:
        out["kind"] = "video"
    elif out["n_audio_tracks"] or out["brand"] in _AUDIO_BRANDS:
        out["kind"] = "audio"
    else:
        out["kind"] = "video"       # BMFF default presentation
    return out
