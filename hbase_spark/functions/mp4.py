"""Minimal ISO-BMFF (MP4) container codec for MJPEG video tracks.

Makes ``sample_frames`` REAL for the second mainstream video container
(after MJPEG-in-AVI, functions/avi.py): an MP4 whose video track's
sample entries are ``jpeg`` — every sample a standalone baseline JPEG
decoded by the existing pure-Python decoder (functions/jpeg.py).

Implements the public ISO/IEC 14496-12 box layout: ``ftyp mdat
moov(mvhd trak(tkhd mdia(mdhd hdlr minf(vmhd dinf
stbl(stsd stts stsc stsz stco)))))``.  Frame timing comes from the
media header timescale and the time-to-sample table (stts), sample
bytes are located through the sample-size (stsz) + sample-to-chunk
(stsc) + chunk-offset (stco/co64) tables — exactly where a real
demuxer reads them.

Corrupt-payload policy (same contract as the other media codecs): a
payload that is not ISO-BMFF, declares no ``jpeg``-coded video track
(e.g. H.264/avc1 — no decoder for it here), or whose tables point
past the file raises ValueError — decode seams never guess.

Reference parity: the reference stores media as opaque qualifier
bytes; containers are decoded client-side (SURVEY §2.8 typed views).
"""

from __future__ import annotations

import struct

_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def encode_mp4_mjpeg(frames, *, fps: int = 10, quality_q: int = 1) -> bytes:
    """Mux HxWx3 uint8 frames as an MJPEG MP4 (fixture encoder — the
    lossless-fixture discipline of encode_avi_mjpeg/encode_wav)."""
    from hbase_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames to encode")
    if fps <= 0:
        raise ValueError("fps must be positive")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality_q=quality_q) for f in frames]
    n = len(jpegs)
    # timescale = fps makes every sample exactly 1 tick long
    timescale, delta, duration = fps, 1, n

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(jpegs))
    chunk_offset = len(ftyp) + 8  # first sample = mdat payload start

    # VisualSampleEntry 'jpeg' (14496-12 §12.1.3; no extension boxes)
    entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)        # reserved, dref index
        + b"\x00" * 16                             # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)       # reserved, frame_count
        + b"\x00" * 32                             # compressorname
        + struct.pack(">Hh", 24, -1),              # depth, pre_defined
    )
    stbl = (
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        + _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
        + _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(j)) for j in jpegs))
        + _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    )
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )
    minf = (
        _full(b"vmhd", 0, 1, b"\x00" * 8)
        + dinf
        + _box(b"stbl", stbl)
    )
    mdia = (
        _full(b"mdhd", 0, 0,
              struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
        + _full(b"hdlr", 0, 0,
                b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"MJPEG\x00")
        + _box(b"minf", minf)
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)          # times, track 1, reserved
        + struct.pack(">I", duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)        # layer, group, volume
        + _IDENTITY_MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume
        + b"\x00" * 8 + _IDENTITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 2),                    # next_track_ID
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + _box(b"mdia", mdia)))
    return ftyp + mdat + moov


def _walk(data: bytes, pos: int, end: int):
    """Yield (box_type, body_start, body_end) for each box; raise on a
    box that runs past its container (a bad size corrupts every
    following offset, so it is an error, not a warning)."""
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if body + 8 > end:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(data[body:body + 8], "big")
            body += 8
        elif size == 0:  # box extends to the end of the container
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("truncated MP4 box")
        yield btype, body, pos + size
        pos += size


def _children(data: bytes, pos: int, end: int) -> dict:
    return {t: (b0, b1) for t, b0, b1 in _walk(data, pos, end)}


def decode_mp4_mjpeg(data: bytes):
    """-> (frames: list of HxWx3 uint8 arrays, fps: float)."""
    from hbase_spark.functions.jpeg import decode_jpeg

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (MP4) payload: no leading ftyp")
    top = _children(data, 0, len(data))
    if b"moov" not in top:
        raise ValueError("not an ISO-BMFF (MP4) payload: no moov")
    for t, b0, b1 in _walk(data, *top[b"moov"]):
        if t != b"trak":
            continue
        trak = _children(data, b0, b1)
        mdia = _children(data, *trak[b"mdia"])
        hdlr0 = mdia[b"hdlr"][0]
        if data[hdlr0 + 8:hdlr0 + 12] != b"vide":
            continue
        mdhd0 = mdia[b"mdhd"][0]
        version = data[mdhd0]
        if version == 1:  # 64-bit times: timescale sits 8 bytes later
            timescale = int.from_bytes(data[mdhd0 + 20:mdhd0 + 24], "big")
        else:
            timescale = int.from_bytes(data[mdhd0 + 12:mdhd0 + 16], "big")
        if not timescale:
            raise ValueError("invalid mdhd timescale")
        minf = _children(data, *mdia[b"minf"])
        stbl = _children(data, *minf[b"stbl"])

        # stsd: the coding four-cc of the first sample entry
        sd0 = stbl[b"stsd"][0]
        fmt = data[sd0 + 12:sd0 + 16]
        if fmt not in (b"jpeg", b"mjpa"):
            raise ValueError(
                f"video track is not MJPEG ({fmt!r}): no decoder for it"
            )

        # stts -> total sample count + total duration in ticks
        st0 = stbl[b"stts"][0]
        n_ent = int.from_bytes(data[st0 + 4:st0 + 8], "big")
        n_samples = total_ticks = 0
        for i in range(n_ent):
            cnt, delta = struct.unpack_from(">II", data, st0 + 8 + 8 * i)
            n_samples += cnt
            total_ticks += cnt * delta
        if not n_samples or not total_ticks:
            raise ValueError("empty stts sample table")
        fps = timescale * n_samples / total_ticks

        # stsz -> per-sample byte sizes
        sz0 = stbl[b"stsz"][0]
        fixed = int.from_bytes(data[sz0 + 4:sz0 + 8], "big")
        count = int.from_bytes(data[sz0 + 8:sz0 + 12], "big")
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(struct.unpack_from(f">{count}I", data, sz0 + 12))

        # stco/co64 + stsc -> byte offset of every sample
        if b"stco" in stbl:
            c0 = stbl[b"stco"][0]
            n_chunks = int.from_bytes(data[c0 + 4:c0 + 8], "big")
            offsets = list(struct.unpack_from(f">{n_chunks}I", data, c0 + 8))
        else:
            c0 = stbl[b"co64"][0]
            n_chunks = int.from_bytes(data[c0 + 4:c0 + 8], "big")
            offsets = list(struct.unpack_from(f">{n_chunks}Q", data, c0 + 8))
        sc0 = stbl[b"stsc"][0]
        sc_n = int.from_bytes(data[sc0 + 4:sc0 + 8], "big")
        runs = [
            struct.unpack_from(">III", data, sc0 + 8 + 12 * i)[:2]
            for i in range(sc_n)
        ]  # (first_chunk, samples_per_chunk), 1-indexed
        jpegs, si = [], 0
        for ci in range(n_chunks):
            per = next(
                per for first, per in reversed(runs) if first <= ci + 1
            )
            off = offsets[ci]
            for _ in range(per):
                if si >= len(sizes):
                    break
                if off + sizes[si] > len(data):
                    raise ValueError("sample table points past the file")
                jpegs.append(data[off:off + sizes[si]])
                off += sizes[si]
                si += 1
        if len(jpegs) != n_samples:
            raise ValueError("sample tables disagree on sample count")
        return [decode_jpeg(j) for j in jpegs], fps
    raise ValueError("no video (hdlr 'vide') track in moov")
