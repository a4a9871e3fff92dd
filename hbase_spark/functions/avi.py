"""Minimal RIFF/AVI container codec for MJPEG video.

Makes ``sample_frames`` REAL for one mainstream video container the
way animated GIF already is (functions/gif.py): an AVI whose video
stream is motion-JPEG — every frame a standalone baseline JPEG decoded
by the existing pure-Python decoder (functions/jpeg.py).

Implements the public AVI RIFF layout (Microsoft "AVI RIFF File
Reference"): ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' 00dc...))``.  Frame timing comes from the video stream
header's dwRate/dwScale pair, exactly where a real demuxer reads it.

Corrupt-payload policy (same contract as the other media codecs):
a payload that is not RIFF/AVI, declares no MJPG video stream, or
truncates mid-chunk raises ValueError — decode seams never guess.

Reference parity: the reference stores media as opaque qualifier
bytes; containers are decoded client-side (SURVEY §2.8 typed views).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames, *, fps: int = 10, quality_q: int = 1) -> bytes:
    """Mux HxWx3 uint8 frames as an MJPEG AVI (fixture encoder — the
    lossless-fixture discipline of encode_wav/encode_png)."""
    from hbase_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames to encode")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality_q=quality_q) for f in frames]
    avih = struct.pack(
        "<10I", int(1_000_000 / fps), 0, 0, 0x10, len(frames), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,          # dwFlags, wPriority, wLanguage
            0,                # dwInitialFrames
            1, fps,           # dwScale, dwRate -> fps = rate/scale
            0, len(frames),   # dwStart, dwLength (frames)
            0, 0xFFFFFFFF, 0,  # dwSuggestedBufferSize, dwQuality, dwSampleSize
        )
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each chunk; raise on a
    chunk that runs past its container (truncation corrupts every
    following offset, so it is an error, not a warning)."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if pos + 8 + size > end:
            raise ValueError("truncated AVI chunk")
        yield cid, pos + 8, pos + 8 + size
        pos += 8 + size + (size & 1)


def decode_avi_mjpeg(data: bytes):
    """-> (frames: list of HxWx3 uint8 arrays, fps: float)."""
    from hbase_spark.functions.jpeg import decode_jpeg

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = None
    jpegs: list[bytes] = []

    def scan_list(pos: int, end: int) -> None:
        nonlocal fps
        for cid, b0, b1 in _walk(data, pos, end):
            if cid == b"LIST":
                scan_list(b0 + 4, b1)
            elif cid == b"strh" and data[b0:b0 + 4] == b"vids":
                if data[b0 + 4:b0 + 8] not in (b"MJPG", b"mjpg"):
                    raise ValueError(
                        "video stream is not MJPG "
                        f"({data[b0 + 4:b0 + 8]!r}): no decoder for it"
                    )
                scale, rate = struct.unpack_from("<II", data, b0 + 20)
                if not scale or not rate:
                    raise ValueError("invalid vids dwScale/dwRate")
                fps = rate / scale
            elif cid in (b"00dc", b"00db"):
                jpegs.append(data[b0:b1])

    scan_list(12, min(len(data), 8 + int.from_bytes(data[4:8], "little")))
    if fps is None:
        raise ValueError("no MJPG video stream header (strh/vids) found")
    if not jpegs:
        raise ValueError("no video frame chunks (00dc) in movi")
    return [decode_jpeg(j) for j in jpegs], fps
