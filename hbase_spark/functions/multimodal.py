"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing — schema, Arrow-batched mapInPandas
pipelines, partition sizing, corrupt-payload policy — is real and
tested, and so are the codecs, all pure Python/numpy (the container
has no media libraries): BMP, PPM, PNG, baseline + progressive JPEG,
GIF (incl. animated frame sampling), and WAV PCM / G.711 / IMA ADPCM
+ FLAC audio.  Formats beyond these (mp3/opus, arithmetic-coded JPEG)
raise a clear NotImplementedError at the same seam a production
C decoder plugs into; ``fake=True`` selects a deterministic fake
decoder for plumbing-only tests.

Design for 100 TB of media:
- binary payloads stay in parquet; metadata columns (width/height/
  duration/codec) are queryable without touching payload bytes thanks
  to parquet column pruning;
- decode/feature steps are ``mapInPandas`` over Arrow batches so the
  (C-library) decoder amortizes per batch, not per row;
- ``maxRecordsPerBatch``/``files.maxPartitionBytes`` bound executor
  memory when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

IMAGE_FEATURES_ERR_SCHEMA = T.StructType(
    IMAGE_FEATURES_SCHEMA.fields
    + [T.StructField("error", T.StringType(), True)]
)


def _fake_decode(payload: bytes, media_id: int, dim: int = 8):
    """Deterministic fake 'decode': derives pixels from a hash of the
    payload so tests exercise the full pipeline shape."""
    h = hash((media_id, len(payload or b"")))
    vals = [((h >> (i * 7)) & 0xFF) / 255.0 for i in range(dim)]
    return {
        "width": 64,
        "height": 64,
        "mean_luma": sum(vals) / dim,
        "feature": [float(v) for v in vals],
    }


def decode_bmp(data: bytes):
    """Pure-numpy decode of an uncompressed 24-bpp BMP (BITMAPINFOHEADER)
    -> HxWx3 uint8 RGB array.  No image library needed — this proves
    the decode seam end-to-end in-container; compressed formats
    (JPEG/PNG) still require a real codec at the same seam."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bpp BMP is supported")
    top_down, h = h < 0, abs(h)
    row_size = (w * 3 + 3) & ~3
    arr = (
        np.frombuffer(data, np.uint8, count=row_size * h, offset=off)
        .reshape(h, row_size)[:, : w * 3]
        .reshape(h, w, 3)[..., ::-1]  # stored BGR -> RGB
    )
    return arr if top_down else arr[::-1]


def decode_ppm(data: bytes):
    """Pure-numpy decode of a binary PPM (P6, maxval 255) -> HxWx3
    uint8 RGB array."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: P6 <width> <height> <maxval> then a single whitespace
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval-255 PPM is supported")
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def decode_png(data: bytes):
    """Pure-Python PNG decode (stdlib zlib + numpy unfilter) ->
    HxWx3 uint8 RGB array.

    Supports non-interlaced 8-bit images in every PNG color type:
    grayscale (0), RGB (2), palette (3), gray+alpha (4), RGBA (6) —
    alpha is composited over white, palette resolves through PLTE.
    Interlaced (Adam7) and 16-bit images raise at the seam."""
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"
    if data[:8] != SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte = 8, bytearray(), None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, interlace = body[8], body[9], body[12]
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0:
        raise NotImplementedError(
            "only 8-bit non-interlaced PNG is supported at this seam"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, scan = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):  # filters are defined row-recursively (spec §9)
        line = scan[y].copy()
        f = filters[y]
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(nch, stride):
                line[x] = (line[x] + line[x - nch]) & 0xFF
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - nch] if x >= nch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b, c = int(prev[x]), int(prev[x - nch]) if x >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = line.astype(np.uint8)
    px = out.reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[..., 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px
    # alpha types: composite over white (training pipelines want RGB)
    rgb = px[..., :1] if ctype == 4 else px[..., :3]
    if ctype == 4:
        rgb = np.repeat(rgb, 3, axis=2)
    alpha = px[..., -1:].astype(np.float64) / 255.0
    return (rgb * alpha + 255.0 * (1 - alpha)).round().astype(np.uint8)


def encode_png(pixels) -> bytes:
    """Minimal RGB PNG encoder (filter 0 rows, one IDAT) — fixture
    builder for the decode path.  ``pixels``: rows of (r, g, b)."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    raw = b"".join(
        b"\x00" + bytes(v for p in row for v in p) for row in pixels
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + cid + body
            + zlib.crc32(cid + body).to_bytes(4, "big")
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes):
    """Pure-numpy decode of a PCM WAV (RIFF) payload ->
    (samples float64 array shaped [n, channels] scaled to [-1, 1],
    sample_rate).  Handles 8/16/32-bit integer PCM (format 1),
    32-bit float PCM (format 3), and ITU G.711 mu-law / A-law
    companded audio (formats 7 / 6); perceptual codecs (mp3/flac/
    opus) still need a real decoder at the same seam."""
    import numpy as np

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw, fact_n = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fact" and size >= 4:
            fact_n = int.from_bytes(body[0:4], "little")
        if cid == b"fmt ":
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "block_align": int.from_bytes(body[12:14], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    af, bits = fmt["audio_format"], fmt["bits"]
    if af == 1 and bits == 16:
        samples = np.frombuffer(raw, "<i2").astype("float64") / 32768.0
    elif af == 1 and bits == 8:  # 8-bit PCM is unsigned
        samples = (np.frombuffer(raw, "u1").astype("float64") - 128.0) / 128.0
    elif af == 1 and bits == 32:
        samples = np.frombuffer(raw, "<i4").astype("float64") / 2147483648.0
    elif af == 3 and bits == 32:
        samples = np.frombuffer(raw, "<f4").astype("float64")
    elif af == 7 and bits == 8:  # ITU G.711 mu-law
        samples = _ulaw_expand(np.frombuffer(raw, "u1")) / 32768.0
    elif af == 6 and bits == 8:  # ITU G.711 A-law
        samples = _alaw_expand(np.frombuffer(raw, "u1")) / 32768.0
    elif af == 0x11 and bits == 4:  # IMA/DVI ADPCM
        if fmt["channels"] != 1:
            raise NotImplementedError(
                "IMA ADPCM decode supports mono; stereo needs the "
                "per-channel 4-byte interleave at this seam"
            )
        block_align = fmt.get("block_align", 0) or (len(raw))
        samples = _ima_adpcm_expand(raw, block_align) / 32768.0
        if fact_n is not None:  # trim final-block padding
            samples = samples[:fact_n]
    else:
        raise NotImplementedError(
            f"unsupported WAV format {af}/{bits}-bit; compressed audio "
            "needs a real codec plugged into this seam"
        )
    ch = max(1, fmt["channels"])
    samples = samples[: len(samples) - len(samples) % ch].reshape(-1, ch)
    return samples, fmt["sample_rate"]


def _ulaw_expand(codes):
    """G.711 mu-law byte -> linear sample (classic expansion: invert,
    rebuild the biased mantissa, shift by the segment, un-bias)."""
    import numpy as np

    u = (~codes.astype("int64")) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype("float64")


def _alaw_expand(codes):
    """G.711 A-law byte -> linear sample (XOR 0x55, then per-segment
    mantissa reconstruction; sign bit set means positive)."""
    import numpy as np

    a = codes.astype("int64") ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype("float64")


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step (DVI/IMA public algorithm)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nibble & 7]))
    return pred, index


def _ima_adpcm_expand(raw: bytes, block_align: int):
    """Mono IMA ADPCM data chunk -> int16 samples (float64 array).
    Each block: 4-byte header (predictor int16 LE, step index, pad),
    then 2 samples per byte, low nibble first."""
    import numpy as np

    out: list[int] = []
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        if len(block) < 4:
            break
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = min(88, block[2])
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                pred, index = _ima_step(pred, index, nibble)
                out.append(pred)
    return np.asarray(out, "float64")


def _ima_quantize(diff: int, step: int) -> int:
    """Encode-side nibble selection (mirror of the decode sum)."""
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    return nibble


def _ima_adpcm_compress(pcm16, block_samples: int = 505) -> tuple[bytes, int]:
    """Mono int16 -> IMA ADPCM blocks; returns (data, block_align)."""
    block_align = 4 + (block_samples - 1 + 1) // 2
    data = bytearray()
    i = 0
    index = 0
    n = len(pcm16)
    while i < n:
        chunk = pcm16[i : i + block_samples]
        i += block_samples
        pred = int(chunk[0])
        data += int(pred).to_bytes(2, "little", signed=True)
        data += bytes((index, 0))
        nibbles = []
        for s in chunk[1:]:
            nib = _ima_quantize(int(s) - pred, _IMA_STEPS[index])
            pred, index = _ima_step(pred, index, nib)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        start = len(data)
        for a, b in zip(nibbles[0::2], nibbles[1::2]):
            data.append(a | (b << 4))
        # pad the final block to block_align
        data += b"\x00" * (block_align - 4 - (len(data) - start))
    return bytes(data), block_align


def _ulaw_compress(pcm16):
    """Linear 16-bit -> G.711 mu-law byte (bias, find segment, pack)."""
    import numpy as np

    x = pcm16.astype("int64") >> 2  # 14-bit
    mask = np.where(x < 0, 0x7F, 0xFF)
    m = np.minimum(np.abs(x) + 33, 0x1FFF)
    seg = np.maximum(np.floor(np.log2(m)).astype("int64") - 5, 0)
    return (((seg << 4) | ((m >> (seg + 1)) & 0x0F)) ^ mask).astype("uint8")


def _alaw_compress(pcm16):
    """Linear 16-bit -> G.711 A-law byte."""
    import numpy as np

    x = pcm16.astype("int64") >> 3  # 13-bit
    mask = np.where(x >= 0, 0xD5, 0x55)
    m = np.where(x < 0, -x - 1, x)
    seg = np.clip(
        np.floor(np.log2(np.maximum(m, 1))).astype("int64") - 4, 0, 7
    )
    mant = np.where(seg < 2, (m >> 1) & 0x0F, (m >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype("uint8")


def encode_wav(
    samples, sample_rate: int = 16000, channels: int = 1,
    codec: str = "pcm16",
) -> bytes:
    """Minimal WAV encoder (fixture builder for the decode path).
    ``samples``: iterable of floats in [-1, 1], interleaved.
    ``codec``: 'pcm16' (format 1), 'ulaw' (G.711 mu-law, format 7) or
    'alaw' (G.711 A-law, format 6)."""
    import numpy as np

    pcm = (np.clip(np.asarray(samples, "float64"), -1, 1) * 32767).astype("<i2")
    fact = b""
    if codec == "pcm16":
        audio_format, bits, raw = 1, 16, pcm.tobytes()
        block = channels * 2
    elif codec == "ulaw":
        audio_format, bits, raw = 7, 8, _ulaw_compress(pcm).tobytes()
        block = channels
    elif codec == "alaw":
        audio_format, bits, raw = 6, 8, _alaw_compress(pcm).tobytes()
        block = channels
    elif codec == "ima_adpcm":
        if channels != 1:
            raise NotImplementedError("IMA ADPCM encoder is mono")
        raw, block = _ima_adpcm_compress(pcm)
        audio_format, bits = 0x11, 4
        fact = (
            b"fact" + (4).to_bytes(4, "little")
            + len(pcm).to_bytes(4, "little")
        )
    else:
        raise ValueError(f"unknown codec {codec!r}")
    fmt = (
        audio_format.to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += fact
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossing_rate", T.DoubleType(), True),
        T.StructField("energy", T.ArrayType(T.FloatType()), True),
    ]
)

AUDIO_FEATURES_ERR_SCHEMA = T.StructType(
    AUDIO_FEATURES_SCHEMA.fields
    + [T.StructField("error", T.StringType(), True)]
)


def _audio_features(samples, sample_rate: int, windows: int = 8) -> dict:
    """Features from decoded samples: RMS, zero-crossing rate, and a
    ``windows``-bucket energy envelope — the deterministic analog of a
    spectrogram encoder (which plugs into the same slot)."""
    import numpy as np

    mono = samples.mean(axis=1)
    n = len(mono)
    zc = float((np.diff(np.signbit(mono)) != 0).sum() / max(1, n - 1))
    bounds = np.linspace(0, n, windows + 1).astype(int)
    energy = [
        float(np.sqrt((mono[a:b] ** 2).mean())) if b > a else 0.0
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    return {
        "sample_rate": int(sample_rate),
        "channels": int(samples.shape[1]),
        "duration_ms": int(n * 1000 // max(1, sample_rate)),
        "rms": float(np.sqrt((mono**2).mean())) if n else 0.0,
        "zero_crossing_rate": zc,
        "energy": energy,
    }


def decode_audio(media: DataFrame, *, fake: bool = False,
                 windows: int = 8, on_error: str = "raise") -> DataFrame:
    """Decode audio payloads into features via mapInPandas.

    WAV (PCM, G.711, IMA ADPCM) and FLAC decode natively; perceptual
    codecs (mp3/opus) raise at the marked seam unless ``fake=True``.
    Same Arrow-batch shape as ``decode_images``; ``on_error`` applies
    the same corrupt-corpus policy ('raise'/'skip'/'tag').
    """
    if on_error not in ("raise", "skip", "tag"):
        raise ValueError(f"bad on_error {on_error!r}")
    def _one(payload: bytes, media_id: int) -> dict:
        if fake:
            f = _fake_decode(payload, media_id, windows)
            return {
                "sample_rate": 16000, "channels": 1,
                "duration_ms": 1000, "rms": f["mean_luma"],
                "zero_crossing_rate": 0.5,
                "energy": f["feature"],
            }
        if (payload or b"")[:4] == b"RIFF":
            return _audio_features(*decode_wav(payload), windows=windows)
        if (payload or b"")[:4] == b"fLaC":
            from hbase_spark.functions.flac import decode_flac

            return _audio_features(*decode_flac(payload), windows=windows)
        raise NotImplementedError(
            "WAV (PCM/G.711/ADPCM) and FLAC decode ship in-container; "
            "mp3/opus need an audio library plugged into this seam (or "
            "pass fake=True)"
        )

    cols = ("sample_rate", "channels", "duration_ms", "rms",
            "zero_crossing_rate", "energy")

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {"media_id": []}
            out.update({c: [] for c in cols})
            errors: list[str | None] = []
            for p, m in zip(pdf["payload"], pdf["media_id"]):
                try:
                    f = _one(p, m)
                    err = None
                except Exception as e:  # noqa: BLE001 — policy-driven
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    f = {c: None for c in cols}
                    err = f"{type(e).__name__}: {e}"
                out["media_id"].append(m)
                for c in cols:
                    out[c].append(f[c])
                errors.append(err)
            if on_error == "tag":
                out["error"] = errors
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    schema = (
        AUDIO_FEATURES_ERR_SCHEMA if on_error == "tag"
        else AUDIO_FEATURES_SCHEMA
    )
    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(_decode_batch, schema)
    )


def _pixel_features(arr) -> dict:
    """Features from a decoded HxWx3 RGB array: per-channel means,
    2x2 quadrant luma means, and luma std — a deterministic 8-dim
    vector (a real CLIP-style encoder plugs into the same slot)."""
    import numpy as np

    a = arr.astype("float64") / 255.0
    luma = a @ np.array([0.299, 0.587, 0.114])
    h, w = luma.shape
    mh, mw = (h + 1) // 2, (w + 1) // 2
    quads = [
        float(luma[rs, cs].mean())
        for rs in (slice(0, mh), slice(mh, h) if mh < h else slice(0, h))
        for cs in (slice(0, mw), slice(mw, w) if mw < w else slice(0, w))
    ]
    feature = [float(a[..., c].mean()) for c in range(3)] + quads + [
        float(luma.std())
    ]
    return {
        "width": int(w),
        "height": int(h),
        "mean_luma": float(luma.mean()),
        "feature": [float(v) for v in feature],
    }


def _decode_pixels(payload: bytes):
    """Decoded HxWx3 RGB array for any in-container image format
    (BMP / PPM / PNG / baseline+progressive JPEG / GIF first frame);
    raises NotImplementedError at the documented seam otherwise."""
    head = (payload or b"")[:8]
    if head[:2] == b"BM":
        return decode_bmp(payload)
    if head[:2] == b"P6":
        return decode_ppm(payload)
    if head == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if head[:3] == b"\xff\xd8\xff":
        from hbase_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if head[:4] == b"GIF8":
        from hbase_spark.functions.gif import decode_gif_first_frame

        return decode_gif_first_frame(payload)
    raise NotImplementedError(
        "BMP/PPM/PNG/GIF/baseline-JPEG decode ships in-container; other "
        "formats need an image library plugged into this seam (or pass "
        "fake=True for the deterministic test decoder)"
    )


def _decode_payload(payload: bytes, media_id: int, *, fake: bool, dim: int):
    if fake:
        return _fake_decode(payload, media_id, dim)
    return _pixel_features(_decode_pixels(payload))


def _box_resample(arr, width: int, height: int):
    """Deterministic box resample to (height, width): destination pixel
    (r, c) is the float mean of the source box with integer edges
    floor(i*src/dst) (each box forced >= 1 px, so upscale degrades to
    nearest-duplication).  Works on HxW and HxWxC arrays; returns
    float64 — callers round/cast for re-encode.  The per-destination
    loop is bounded by the THUMBNAIL size (64x64 = 4k slices), not the
    source; a reduceat/integral-image path is the vectorized upgrade
    if thumbnails ever get large."""
    import numpy as np

    src = np.asarray(arr, dtype="float64")
    sh, sw = src.shape[0], src.shape[1]

    def bins(dst: int, n: int):
        edges = [(i * n) // dst for i in range(dst + 1)]
        return [(lo, max(hi, lo + 1)) for lo, hi in zip(edges, edges[1:])]

    out = np.empty((height, width) + src.shape[2:], dtype="float64")
    for r, (r0, r1) in enumerate(bins(height, sh)):
        band = src[r0:r1]
        for c, (c0, c1) in enumerate(bins(width, sw)):
            out[r, c] = band[:, c0:c1].mean(axis=(0, 1))
    return out


def _dhash_bits(arr) -> int:
    """64-bit difference hash (the classic dHash of the perceptual-
    hashing literature): luma, box-resample to 9x8, bit (r, c) set iff
    the pixel is brighter than its right neighbor.  Invariant to
    uniform brightness/contrast shifts and to resizing — the cheap
    near-dup signature for image corpora.  Returned as a SIGNED 64-bit
    int (two's complement) so it lands in a Spark long."""
    import numpy as np

    luma = np.asarray(arr, dtype="float64") @ np.array([0.299, 0.587, 0.114])
    g = _box_resample(luma, 9, 8)
    v = 0
    for r in range(8):
        for c in range(8):
            if g[r, c] > g[r, c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= 1 << 63 else v


def decode_images(
    media: DataFrame, *, fake: bool = False, batch_dim: int = 8,
    on_error: str = "raise",
) -> DataFrame:
    """Decode image payloads into features via mapInPandas.

    BMP/PPM/PNG/GIF/JPEG decode natively — pure numpy over Arrow
    batches, no image library; unsupported formats raise at the
    marked seam unless ``fake=True``.  The Spark plumbing — Arrow
    batching, schema, column pruning of untouched metadata — is
    identical for every decoder.

    ``on_error`` is the corrupt-corpus policy a 100 TB run needs (one
    bad payload must not kill a thousand-task job, and dropping it
    silently hides data loss): 'raise' (default — fail the task),
    'skip' (drop the row), or 'tag' (emit the row with null features
    and the error message in an ``error`` column, so the quarantine
    set is queryable and the loss is quantified).
    """
    if on_error not in ("raise", "skip", "tag"):
        raise ValueError(f"bad on_error {on_error!r}")

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "width": [], "height": [],
                "mean_luma": [], "feature": [],
            }
            errors: list[str | None] = []
            for p, m in zip(pdf["payload"], pdf["media_id"]):
                try:
                    f = _decode_payload(p, m, fake=fake, dim=batch_dim)
                    err = None
                except Exception as e:  # noqa: BLE001 — policy-driven
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    f = {"width": None, "height": None,
                         "mean_luma": None, "feature": None}
                    err = f"{type(e).__name__}: {e}"
                rows["media_id"].append(m)
                rows["width"].append(f["width"])
                rows["height"].append(f["height"])
                rows["mean_luma"].append(f["mean_luma"])
                rows["feature"].append(f["feature"])
                errors.append(err)
            if on_error == "tag":
                rows["error"] = errors
            # object dtype everywhere: an all-skipped (empty) or
            # all-null batch must not let pandas pick float64 for the
            # array columns, which Arrow cannot cast to list<float>
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in rows.items()}
            )

    schema = (
        IMAGE_FEATURES_ERR_SCHEMA if on_error == "tag"
        else IMAGE_FEATURES_SCHEMA
    )
    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        _decode_batch, schema
    )


EXIF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("orientation", T.IntegerType(), True),
        T.StructField("datetime_original", T.StringType(), True),
        T.StructField("has_gps", T.BooleanType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]
)

STRIPPED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("segments_removed", T.IntegerType(), False),
    ]
)


def exif_features(media: DataFrame, *, on_error: str = "raise") -> DataFrame:
    """Per-image EXIF audit columns (functions/exif.py parse_exif) —
    the image-side ``pii_stats``: camera make/model, orientation,
    capture time, and GPS as signed decimal degrees (``has_gps`` is
    the PII flag a curation pipeline filters or routes to stripping).
    Header-only parse per payload (no entropy decode), Arrow-batched;
    ``on_error`` follows the shared corrupt-media policy ('raise' /
    'skip' / 'tag' is unnecessary here — absent EXIF is a row of
    nulls, not an error)."""
    from hbase_spark.functions.exif import parse_exif

    if on_error not in ("raise", "skip"):
        raise ValueError(f"bad on_error {on_error!r}")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EXIF_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    x = parse_exif(bytes(p)) or {}
                except Exception:  # noqa: BLE001 — policy-driven
                    if on_error == "raise":
                        raise
                    continue
                rows.append(
                    (
                        m, x.get("make"), x.get("model"),
                        x.get("orientation"), x.get("datetime_original"),
                        # Either coordinate alone is already a PII leak
                        # (a lat with a corrupt lon ref still places the
                        # subject on a line) — flag on OR, not AND.
                        x.get("lat") is not None or x.get("lon") is not None,
                        x.get("lat"), x.get("lon"),
                    )
                )
            yield pd.DataFrame(rows, columns=cols).astype("object")

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_parse, EXIF_SCHEMA)
    )


def strip_image_metadata(
    media: DataFrame, *, keep_app0: bool = True, on_error: str = "raise"
) -> DataFrame:
    """Rewrite JPEG payloads with metadata APPn/COM segments removed
    (functions/exif.py strip_metadata; color-carrying APP0/APP2/APP14
    kept) — the image-side ``redact_pii``.  Entropy-coded data copies
    verbatim, so decoded pixels are byte-identical (pytest-pinned);
    ``segments_removed`` quantifies the redaction per image the way
    pii_total does for text.  ``on_error`` follows the shared
    corrupt-media policy: 'raise' fails the task on a non-JPEG /
    corrupt payload, 'skip' drops the row, 'keep' passes the payload
    through untouched with segments_removed = -1 (the quarantine-
    visible choice when downstream still wants the bytes)."""
    from hbase_spark.functions.exif import strip_metadata

    if on_error not in ("raise", "skip", "keep"):
        raise ValueError(f"bad on_error {on_error!r}")

    def _strip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "segments_removed": []}
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    clean, n = strip_metadata(bytes(p), keep_app0=keep_app0)
                except Exception:  # noqa: BLE001 — policy-driven
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    clean, n = bytes(p), -1
                out["media_id"].append(m)
                out["payload"].append(clean)
                out["segments_removed"].append(n)
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in out.items()}
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_strip, STRIPPED_SCHEMA)
    )


def encode_bmp(pixels) -> bytes:
    """Minimal uncompressed 24-bpp BMP encoder (fixture builder for the
    decode path; also usable as a real re-encode sink after resize).
    ``pixels``: row-major list of rows of (r, g, b) tuples, top-down."""
    h, w = len(pixels), len(pixels[0])
    row_size = (w * 3 + 3) & ~3
    img = bytearray()
    for row in reversed(pixels):  # BMP stores bottom-up
        for r, g, b in row:
            img += bytes((b, g, r))
        img += b"\x00" * (row_size - w * 3)
    off, size = 54, 54 + len(img)
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(img).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(hdr + info + img)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(
    media: DataFrame, *, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads (the thumbnail/normalize step of a vision
    training pipeline) via mapInPandas.

    The real path (default) decodes with the in-container codecs
    (BMP/PPM/PNG/JPEG/GIF), box-resamples (deterministic area means,
    ``_box_resample``), and re-encodes as uncompressed BMP — a genuine
    thumbnail pipeline with no external library; undecodable formats
    raise at the shared codec seam.  The fake path emits a
    deterministic payload derived from the source bytes + target dims
    (for exercising downstream stages against non-image payloads).
    """

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if fake:
                out_payloads = [
                    bytes([b % 256 for b in (len(p or b""), width, height)])
                    + (p or b"")[:16]
                    for p in pdf["payload"]
                ]
            else:
                out_payloads = []
                for p in pdf["payload"]:
                    px = np.clip(
                        np.rint(_box_resample(_decode_pixels(p), width, height)),
                        0, 255,
                    ).astype("uint8")
                    out_payloads.append(
                        encode_bmp(
                            [
                                [tuple(int(v) for v in px[r, c]) for c in range(width)]
                                for r in range(height)
                            ]
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_resize_batch, RESIZED_SCHEMA)
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def dhash_images(
    media: DataFrame, *, on_error: str = "raise"
) -> DataFrame:
    """Per-image 64-bit perceptual difference hash (``_dhash_bits``)
    via the same Arrow seam as decode_images, with the shared
    corrupt-payload policy ('raise' / 'skip' / 'tag' — tagged rows keep
    a NULL dhash and the error in-schema)."""
    if on_error not in ("raise", "skip", "tag"):
        raise ValueError(f"bad on_error {on_error!r}")

    def _hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, errors = [], [], []
            for p, m in zip(pdf["payload"], pdf["media_id"]):
                try:
                    h, err = _dhash_bits(_decode_pixels(p)), None
                except Exception as e:  # noqa: BLE001 — policy-driven
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    h, err = None, f"{type(e).__name__}: {e}"
                ids.append(m)
                hashes.append(h)
                errors.append(err)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "dhash": pd.Series(hashes, dtype="object"),
                    "error": pd.Series(errors, dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_hash_batch, DHASH_SCHEMA)
    )


def image_near_dups(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    on_error: str = "raise",
) -> DataFrame:
    """Near-duplicate image pairs: dHash signatures -> the shared
    pigeonhole Hamming banding (functions/dedup.py hamming_candidates,
    the SimHash machinery) -> exact-Hamming verified (id_a, id_b,
    hamming).  Brightness/contrast-shifted and re-scaled copies land at
    Hamming 0-2; feed the pairs to dedup_clusters for transitive image
    dedup.  Decode runs once per image (map-only); only (id, 64-bit
    sig) structs reach the banding shuffle."""
    from hbase_spark.functions.dedup import hamming_candidates

    sig = dhash_images(media, on_error=on_error).filter(
        F.col("dhash").isNotNull()
    ).select(F.col("media_id").alias("_id"), F.col("dhash").alias("_sig"))
    return hamming_candidates(sig, max_hamming=max_hamming, bands=bands)


def extract_features(
    media: DataFrame, *, dim: int = 8, fake: bool = False
) -> DataFrame:
    """Embedding extraction over any media kind -> (media_id, kind,
    embedding array<float>) — the bridge from multimodal payloads into
    the similarity/ANN operators (functions/similarity.py).  Fake path
    derives a deterministic vector from the payload hash; a real model
    (CLIP et al.) plugs into the same Arrow-batched seam."""
    if not fake:
        raise NotImplementedError(
            "feature extraction requires a model runtime not present in "
            "this container; pass fake=True for the deterministic stub "
            "or plug a real encoder into _feat_batch"
        )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = [
                _fake_decode(p, m, dim)["feature"]
                for p, m in zip(pdf["payload"], pdf["media_id"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": embs,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_feat_batch, schema)


def sample_frames(media: DataFrame, *, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Stub decode; real plumbing: the explode of (media_id, frame_ts)
    happens JVM-side from duration metadata, so the expensive decoder
    only ever sees rows it must decode.
    """
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts"),
    )
    if not fake:
        # plumbing-only path: frame plan without pixel decode
        return frames
    return frames.withColumn(
        "frame_feature",
        F.array(*[(F.xxhash64("media_id", "frame_ts") % 1000) / 1000.0]),
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def sample_gif_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over animated-GIF payloads: decode each
    payload's frame sequence once, walk the per-frame delays, and emit
    the frame visible at every ``every_ms`` tick with its luma stats —
    one output row per sampled frame.

    Scale shape: same Arrow-batched mapInPandas seam as image decode;
    the decoder runs once per payload however many ticks sample it,
    and only (media_id, payload) columns reach Python.  Container
    formats a production stack decodes with ffmpeg plug into this
    exact seam."""
    import numpy as np

    from hbase_spark.functions.gif import decode_gif

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_ts": [], "width": [],
                "height": [], "mean_luma": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, delays = decode_gif(bytes(payload))
                total = sum(delays)
                starts, t = [], 0
                for d in delays:
                    starts.append(t)
                    t += d
                for ts in range(0, max(total, 1), every_ms):
                    i = max(
                        j for j, s in enumerate(starts) if s <= ts
                    )
                    f = frames[i]
                    luma = (
                        0.299 * f[..., 0] + 0.587 * f[..., 1]
                        + 0.114 * f[..., 2]
                    )
                    rows["media_id"].append(mid)
                    rows["frame_ts"].append(ts)
                    rows["width"].append(f.shape[1])
                    rows["height"].append(f.shape[0])
                    rows["mean_luma"].append(float(np.mean(luma)))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def _sample_fps_frames(media: DataFrame, decode, every_ms: int) -> DataFrame:
    """Shared fps-timeline sampler for containers whose demuxer
    returns (frames, fps) — MJPEG-in-AVI and MJPEG-in-MP4.  Same
    contract, schema and Arrow-batched mapInPandas seam as
    ``sample_gif_frames``, so all the container arms are
    interchangeable in a pipeline.  Decode runs once per payload
    regardless of tick count; only (media_id, payload) reach Python."""
    import numpy as np

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_ts": [], "width": [],
                "height": [], "mean_luma": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, fps = decode(bytes(payload))
                frame_ms = 1000.0 / fps
                total = int(frame_ms * len(frames))
                for ts in range(0, max(total, 1), every_ms):
                    f = frames[min(int(ts / frame_ms), len(frames) - 1)]
                    luma = (
                        0.299 * f[..., 0] + 0.587 * f[..., 1]
                        + 0.114 * f[..., 2]
                    )
                    rows["media_id"].append(mid)
                    rows["frame_ts"].append(ts)
                    rows["width"].append(f.shape[1])
                    rows["height"].append(f.shape[0])
                    rows["mean_luma"].append(float(np.mean(luma)))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        _sample, FRAME_SAMPLE_SCHEMA
    )


def sample_avi_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over MJPEG-in-AVI payloads (functions/avi.py
    demuxes the RIFF container, functions/jpeg.py decodes each
    frame)."""
    from hbase_spark.functions.avi import decode_avi_mjpeg

    return _sample_fps_frames(media, decode_avi_mjpeg, every_ms)


def sample_mp4_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over MJPEG-in-MP4 payloads (functions/mp4.py
    walks the ISO-BMFF sample tables, functions/jpeg.py decodes each
    sample): frame timing from mdhd/stts, sample bytes from
    stsz+stsc+stco — the fps timeline then samples exactly like the
    AVI arm."""
    from hbase_spark.functions.mp4 import decode_mp4_mjpeg

    return _sample_fps_frames(media, decode_mp4_mjpeg, every_ms)


def make_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for pipeline tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes([(i * 7 + j) % 256 for j in range(64)])
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "duration_ms": 5000 if kind == "video" else None,
            "sample_rate": 16000 if kind == "audio" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
