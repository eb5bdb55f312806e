"""Minimal AVI container codec (stdlib only): MJPEG and rawvideo.

The sandbox has no video libraries, but an AVI carrying Motion-JPEG or
uncompressed (BI_RGB 'rawvideo') DIB frames is fully decodable with
what the repo already ships: this module walks the RIFF container
(reference for the layout: the public AVI RIFF spec — 'RIFF…AVI ' →
LIST hdrl (avih / strl) → LIST movi with ``00dc``/``00db`` frame
chunks, word-aligned), hands MJPEG frames to ``core/jpeg.py``, and
surfaces the video strf BITMAPINFOHEADER so raw DIB frames can reuse
``core/bmp.py``.  The encoders write the same shapes so round-trips
are self-contained.

Deliberately tolerant on decode (real muxers vary): meta comes from
the first ``avih`` chunk found; frames are any ``..dc``/``..db``
sub-chunk of any ``movi`` list, in file order; the optional ``idx1``
index is ignored.  Anything structurally unsound raises ``ValueError``
— Spark stages quarantine per payload.
"""

from __future__ import annotations

import struct

AVI_RIFF_SIG = b"RIFF"
AVI_FORM = b"AVI "


def riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    """One word-aligned RIFF chunk (the writer-side inverse of
    ``riff_chunks``) — the single home for the size/padding arithmetic
    shared by the AVI encoders and the WAV synthesizers."""
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def build_wav(fmt_body: bytes, data: bytes) -> bytes:
    """WAVEFORMATEX body + raw sample data → a complete RIFF/WAVE
    payload, so any source that surfaces those two pieces (AVI ``auds``
    streams, Matroska ``A_MS/ACM`` tracks) re-dispatches through the
    one tested WAV decode matrix."""
    body = (b"WAVE" + riff_chunk(b"fmt ", fmt_body)
            + riff_chunk(b"data", data))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run,
    honoring word alignment and clamping corrupt lengths to the
    enclosing scope.  Shared by the AVI and WAV walkers."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            # truncated / corrupt-length final chunk: expose only what
            # lies inside the enclosing scope
            size = max(0, end - body)
        yield fourcc, body, size
        pos = body + size + (size & 1)


def decode_avi(payload: bytes) -> tuple[list[bytes], dict]:
    """AVI bytes → (frame payloads in file order, header meta).

    Meta keys: width, height, n_frames (from ``avih``; n_frames falls
    back to the counted movi chunks when the header lies or is 0),
    us_per_frame, handler (the strh fccHandler, e.g. ``b'MJPG'``).

    Multi-stream AVIs decode their FIRST video and FIRST audio
    stream: strf/frames/audio are matched to that stream's strl index
    via the movi chunk ids (``NNdc``/``NNdb``/``NNwb``), so a second
    video stream with a different codec or geometry never leaks its
    chunks into the first stream's decode (``track_inventory`` still
    reports every stream).
    """
    if payload[:4] != AVI_RIFF_SIG or payload[8:12] != AVI_FORM:
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)

    meta = {"width": None, "height": None, "n_frames": 0,
            "us_per_frame": None, "handler": None, "strf": None,
            "audio_strf": None, "audio": None}
    frames: list[bytes] = []
    audio: list[bytes] = []
    stream = None                    # fccType of the current strl
    si = -1                          # strl index == movi chunk-id NN
    video_si = None                  # first vids stream index
    audio_si = None                  # first auds stream index

    def walk(start: int, stop: int) -> None:
        nonlocal stream, si, video_si, audio_si
        for fourcc, body, size in riff_chunks(payload, start, stop):
            if fourcc == b"LIST":
                list_type = payload[body:body + 4]
                if list_type in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(body + 4, body + size)
            elif fourcc == b"avih" and size >= 40:
                (uspf, _, _, _, total, _, _, _, w, h) = struct.unpack_from(
                    "<10I", payload, body)
                meta.update(width=int(w), height=int(h),
                            n_frames=int(total), us_per_frame=int(uspf))
            elif fourcc == b"strh" and size >= 8:
                si += 1
                stream = payload[body:body + 4]
                if stream == b"vids" and video_si is None:
                    video_si = si
                    meta["handler"] = payload[body + 4:body + 8]
                elif stream == b"auds" and audio_si is None:
                    audio_si = si
            elif fourcc == b"strf":
                # geometry/format kept only for the FIRST stream of
                # its kind — chunk collection below matches the same
                # index, so later streams never mix into this decode
                if stream == b"vids" and si == video_si and size >= 40:
                    # the video stream format is a BITMAPINFOHEADER
                    # (+ palette) — rawvideo (BI_RGB) frames are
                    # headerless pixel arrays whose geometry only
                    # lives here
                    meta["strf"] = payload[body:body + size]
                elif stream == b"auds" and si == audio_si and size >= 16:
                    # WAVEFORMATEX: becomes the fmt chunk of the
                    # synthesized WAV in avi_audio_wav
                    meta["audio_strf"] = payload[body:body + size]
                stream = None
            elif fourcc[2:4] in (b"dc", b"db") and size > 0 \
                    and fourcc[:2].isdigit():
                if int(fourcc[:2]) == video_si:
                    frames.append(payload[body:body + size])
            elif fourcc[2:4] == b"wb" and size > 0 \
                    and fourcc[:2].isdigit():
                if int(fourcc[:2]) == audio_si:
                    audio.append(payload[body:body + size])

    walk(12, end)
    if meta["width"] is None:
        raise ValueError("AVI without avih header")
    if audio:
        meta["audio"] = b"".join(audio)
    if not frames and meta["audio"] is None:
        raise ValueError("AVI with no video or audio chunks")
    if not meta["n_frames"]:
        meta["n_frames"] = len(frames)
    return frames, meta


def avi_audio_wav(payload: bytes) -> bytes:
    """Extract an AVI's interleaved audio track as a WAV payload: the
    ``auds`` strf is verbatim a WAVEFORMATEX (= the WAV fmt chunk
    body), and the ``..wb`` chunk run concatenated in file order is
    the data chunk — so the existing WAV matrix (PCM, G.711,
    IMA-ADPCM) decodes it with no new codec."""
    _, meta = decode_avi(payload)
    strf, data = meta["audio_strf"], meta["audio"]
    if strf is None or data is None:
        raise ValueError("AVI without an audio stream")
    return build_wav(strf, data)


def avi_meta(payload: bytes) -> dict | None:
    """Header-only dims probe (for ``parse_meta``): cheap avih scan,
    no frame collection.  Returns None when not an AVI."""
    if payload[:4] != AVI_RIFF_SIG or payload[8:12] != AVI_FORM:
        return None
    try:
        # avih always lives in the first hdrl LIST near the file head —
        # a bounded scan keeps this O(1) even for multi-GB payloads
        head = payload[:4096]
        idx = head.find(b"avih")
        if idx < 0 or idx + 48 > len(head):
            return None
        (_, _, _, _, total, _, _, _, w, h) = struct.unpack_from(
            "<10I", head, idx + 8)
        return {"width": int(w), "height": int(h), "n_frames": int(total)}
    except struct.error:
        return None


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG frame payloads → a minimal, spec-shaped MJPEG AVI."""
    if not jpeg_frames:
        raise ValueError("cannot encode an AVI with zero frames")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
    chunk = riff_chunk

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_size * fps, 0, 0x10, n, 0, 1,
        max_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<I", 0)
            + struct.pack("<HH", 0, 0)
            + struct.pack("<8I", 0, 1, fps, 0, n, max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sI4i", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    index = []
    for f in jpeg_frames:
        index.append((len(movi_body) - 4, len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in index)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_raw8(frames: list, fps: int = 10) -> bytes:
    """Grayscale (h, w) uint8 arrays → an uncompressed (BI_RGB
    'rawvideo') AVI: 8-bit palettized DIB frames, bottom-up rows
    padded to 4 bytes, geometry + gray palette in the strf
    BITMAPINFOHEADER — the legacy capture format old crawls carry."""
    if not frames:
        raise ValueError("cannot encode an AVI with zero frames")
    h, w = frames[0].shape
    stride = (w + 3) & ~3
    n = len(frames)

    def dib(a) -> bytes:
        rows = bytearray()
        for y in range(h - 1, -1, -1):          # bottom-up
            rows += bytes(bytearray(a[y].tobytes()).ljust(stride, b"\0"))
        return bytes(rows)

    raw = [dib(f) for f in frames]
    frame_size = stride * h
    chunk = riff_chunk

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1,
        frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<I", 0)
            + struct.pack("<HH", 0, 0)
            + struct.pack("<8I", 0, 1, fps, 0, n, frame_size,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    palette = b"".join(struct.pack("<BBBB", v, v, v, 0)
                       for v in range(256))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                       frame_size, 0, 0, 0, 0) + palette
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi"
    for f in raw:
        movi_body += chunk(b"00db", f)
    body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body
