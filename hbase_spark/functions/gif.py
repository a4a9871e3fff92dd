"""Pure-Python GIF (87a/89a) codec for the multimodal decode seam.

Decodes the real format end-to-end in-container — LZW, global/local
color tables, interlacing, transparency, and multi-frame animation
with disposal-method compositing — so both the image decode path
(first composed frame) and video-style frame sampling run on genuine
payloads without an image library.  The encoder writes valid GIFs
using the classic "uncompressed GIF" LZW technique (clear codes
emitted before the dictionary would widen), which every conforming
decoder accepts.

Reference parity note: the reference engine treats media as opaque
bytes (SURVEY §1.2 — byte[] values; MOB for large ones); this module
is part of the training-data-pipeline extension surface, not an HBase
API port.  Format layout follows the public GIF89a specification.
"""

from __future__ import annotations


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """LZW decompression of a GIF index stream (codes LSB-first)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, total = 0, len(data) * 8
    while bitpos + code_size <= total:
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            del table[clear + 2 :]
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """LZW stream via the uncompressed-GIF technique: literal codes at
    ``min_code_size + 1`` bits with a clear code before the table would
    force a wider code — valid output for any conforming decoder."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = bits = 0
    buf = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    run = 0
    for idx in indices:
        emit(int(idx))
        run += 1
        if run >= clear - 2:
            emit(clear)
            run = 0
    emit(end)
    if bits:
        buf.append(acc & 0xFF)
    return bytes(buf)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list, height: int) -> list:
    out = [None] * height
    it = iter(rows)
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = next(it)
    return out


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(chunks), pos
        chunks += data[pos : pos + n]
        pos += n


def decode_gif(data: bytes):
    """Decode every frame -> (frames, delays_ms).

    ``frames``: list of numpy uint8 arrays shaped [H, W, 3] — each the
    FULL logical screen after compositing that frame (transparency +
    disposal methods 0-3 honored, as a viewer would render it).
    ``delays_ms``: per-frame display delay.
    """
    import numpy as np

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    packed, bg_index = data[10], data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], "u1").reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 3), "u1")
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    bg = canvas.copy()

    frames, delays = [], []
    delay_ms, transparent = 0, None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                delay_ms = int.from_bytes(body[1:3], "little") * 10
                transparent = body[3] if flags & 0x01 else None
            continue
        if b != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(data[pos : pos + 3 * n], "u1").reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw)[: w * h]
        rows = [idx[y * w : (y + 1) * w] for y in range(h)]
        if ipacked & 0x40:
            rows = _deinterlace(rows, h)
        indices = np.asarray(rows, "int64")

        before = canvas.copy()
        region = canvas[top : top + h, left : left + w]
        pixels = table[np.clip(indices, 0, len(table) - 1)]
        if transparent is not None:
            mask = (indices != transparent)[..., None]
            region[:, :] = np.where(mask, pixels, region)
        else:
            region[:, :] = pixels
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore to background color
            canvas[top : top + h, left : left + w] = bg[
                top : top + h, left : left + w
            ]
        elif disposal == 3:  # restore to previous
            canvas = before
        disposal, delay_ms, transparent = 0, 0, None
    return frames, delays


def decode_gif_first_frame(data: bytes):
    """First composed frame as a numpy uint8 array [H, W, 3] — the
    shape the image feature extractor consumes (same contract as the
    BMP/PPM/PNG decoders)."""
    frames, _ = decode_gif(data)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0]


def encode_gif(
    frames,
    *,
    delays_ms=None,
    transparent_index: int | None = None,
    disposal: int = 1,
    interlace: bool = False,
) -> bytes:
    """Animated-GIF encoder (fixture builder + re-encode sink).

    ``frames``: list of numpy-like [H, W, 3] uint8 arrays (all the
    same size; full-screen frames).  A global color table is built
    from the distinct colors (max 256).  ``transparent_index`` marks
    that palette slot transparent in every frame after the first.
    """
    import numpy as np

    frames = [np.asarray(f, "u1") for f in frames]
    h, w = frames[0].shape[:2]
    colors: dict[tuple, int] = {}
    for f in frames:
        for px in f.reshape(-1, 3):
            colors.setdefault(tuple(int(c) for c in px), len(colors))
    if len(colors) > 256:
        raise ValueError("encode_gif supports at most 256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())
    n = 1 << depth
    palette = bytearray()
    for c in sorted(colors, key=colors.get):
        palette += bytes(c)
    palette += b"\x00" * (3 * n - len(palette))

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes((0x80 | (depth - 1), 0, 0))
    out += palette
    delays = delays_ms or [100] * len(frames)
    min_code = max(2, depth)
    for i, f in enumerate(frames):
        flags = (disposal & 0x07) << 2
        tr = 0
        if transparent_index is not None and i > 0:
            flags |= 0x01
            tr = transparent_index
        out += bytes((0x21, 0xF9, 4, flags))
        out += (delays[i] // 10).to_bytes(2, "little")
        out += bytes((tr, 0))
        out += b"\x2c" + (0).to_bytes(4, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes((0x40 if interlace else 0,))
        idx = np.array(
            [[colors[tuple(int(c) for c in px)] for px in row] for row in f],
            "int64",
        )
        if interlace:
            order = [
                y
                for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)
            ]
            idx = idx[order]
        out += bytes((min_code,))
        lzw = _lzw_encode(min_code, idx.reshape(-1))
        for off in range(0, len(lzw), 255):
            block = lzw[off : off + 255]
            out += bytes((len(block),)) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
