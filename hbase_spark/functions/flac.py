"""Pure-Python FLAC codec for the multimodal audio seam.

Decodes the real lossless format end-to-end in-container: STREAMINFO
metadata, frame headers (UTF-8 coded numbers, all block-size/rate/
sample-size codes, CRC-8 verification), CONSTANT / VERBATIM / FIXED /
LPC subframes with wasted bits, partitioned Rice residuals (4- and
5-bit parameters, escape codes), stereo decorrelation (left-side /
right-side / mid-side), and frame CRC-16 verification.  The encoder
writes valid streams using fixed-order-2 prediction with single-
partition Rice residuals — enough to exercise the predictor, Rice,
and CRC paths; decode(encode(x)) is exactly x (the format is
lossless).

Layout follows the public FLAC format specification (RFC 9639).
Throughput note: pure-Python entropy decode is the slow path — plug
libFLAC into the same seam at production scale.
"""

from __future__ import annotations


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _Bits:
    """MSB-first bit reader with byte-position tracking."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of the next unread byte
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        return v

    def sread(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n -= self.n % 8
        self.pos -= self.n // 8
        self.acc = self.n = 0


_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


def _rice_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    parts = 1 << po
    out: list[int] = []
    for p in range(parts):
        count = blocksize >> po
        if p == 0:
            count -= order
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(count):
                out.append(br.sread(raw) if raw else 0)
        else:
            for _ in range(count):
                q = br.unary()
                u = (q << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("invalid subframe padding bit")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if t == 0:  # CONSTANT
        v = br.sread(bps)
        out = [v] * blocksize
    elif t == 1:  # VERBATIM
        out = [br.sread(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED
        order = t - 8
        out = [br.sread(bps) for _ in range(order)]
        res = _rice_residual(br, blocksize, order)
        coefs = _FIXED[order]
        for r in res:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
            out.append(r + pred)
    elif t >= 32:  # LPC
        order = t - 31
        out = [br.sread(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = br.sread(5)
        coefs = [br.sread(precision) for _ in range(order)]
        res = _rice_residual(br, blocksize, order)
        for r in res:
            pred = sum(
                c * out[-i - 1] for i, c in enumerate(coefs)
            ) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved FLAC subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes):
    """Decode a FLAC payload -> (samples float64 [n, channels] scaled
    to [-1, 1], sample_rate)."""
    import numpy as np

    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + size]
        if hdr & 0x7F == 0:  # STREAMINFO
            br = _Bits(body)
            br.read(16); br.read(16); br.read(24); br.read(24)
            info = {
                "rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total": br.read(36),
            }
        pos += 4 + size
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")

    channels_out: list[list[int]] = [[] for _ in range(info["channels"])]
    while pos < len(data) - 2:
        start = pos
        br = _Bits(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _utf8_number(br)
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        elif bs_code >= 8:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved FLAC block size code")
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code in _RATES:
            pass
        bps = info["bps"] if size_code == 0 else _SIZES[size_code]
        crc_calc = _crc8(data[start : br.pos])
        if br.read(8) != crc_calc:
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_subframe(br, blocksize, bps) for _ in range(nch)]
        else:
            # stereo decorrelation: the side channel carries +1 bit
            a_extra = 1 if ch_code == 9 else 0
            b_extra = 1 if ch_code in (8, 10) else 0
            a = _subframe(br, blocksize, bps + a_extra)
            b = _subframe(br, blocksize, bps + b_extra)
            if ch_code == 8:  # left / side
                subs = [a, [l - s for l, s in zip(a, b)]]
            elif ch_code == 9:  # side / right
                subs = [[r + s for s, r in zip(a, b)], b]
            elif ch_code == 10:  # mid / side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
            else:
                raise ValueError("reserved FLAC channel assignment")
        br.align()
        frame_crc = _crc16(data[start : br.pos])
        if int.from_bytes(data[br.pos : br.pos + 2], "big") != frame_crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos + 2
        for ch, s in zip(channels_out, subs):
            ch.extend(s)

    total = info["total"] or len(channels_out[0])
    arr = np.asarray(
        [ch[:total] for ch in channels_out], "float64"
    ).T
    return arr / (1 << (info["bps"] - 1)), info["rate"]


# ------------------------------------------------------------ encoder


class _BitsW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _rice_write(bw: _BitsW, residuals: list[int], param: int) -> None:
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        q = u >> param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def encode_flac(samples, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit FLAC encoder (fixture builder): fixed-order-2
    prediction, single-partition Rice residuals, one frame per 4096
    samples.  Lossless — decode(encode(x)) == x exactly."""
    import numpy as np

    pcm = (
        np.clip(np.asarray(samples, "float64"), -1, 1) * 32767
    ).astype("int64")
    n = len(pcm)
    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(4096, 16); si.write(4096, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)       # channels - 1
    si.write(15, 5)      # bps - 1
    si.write(n, 36)
    si.align()
    body = bytes(si.buf) + b"\x00" * 16  # md5 unset
    out += bytes((0x80,)) + len(body).to_bytes(3, "big") + body

    for fno, off in enumerate(range(0, n, 4096)):
        chunk = [int(v) for v in pcm[off : off + 4096]]
        bs = len(chunk)
        bw = _BitsW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)   # fixed block size strategy
        bw.write(7, 4)   # block size: 16-bit value - 1 follows
        bw.write(0, 4)   # rate: from STREAMINFO
        bw.write(0, 4)   # mono
        bw.write(4, 3)   # 16-bit samples
        bw.write(0, 1)
        bw.write(fno & 0x7F, 8)  # UTF-8 frame number (< 128)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bytes(bw.buf)
        hdr += bytes((_crc8(hdr),))

        sb = _BitsW()
        sb.write(0, 1)
        order = 2 if bs > 2 else 0
        sb.write(8 + order, 6)   # FIXED subframe
        sb.write(0, 1)           # no wasted bits
        for i in range(order):
            sb.write(chunk[i], 16)
        res = [
            chunk[i] - 2 * chunk[i - 1] + chunk[i - 2]
            for i in range(order, bs)
        ] if order == 2 else list(chunk)
        sb.write(0, 2)           # 4-bit rice parameters
        sb.write(0, 4)           # partition order 0
        mean = max(1, sum(abs(r) for r in res) // max(1, len(res)))
        param = min(14, max(0, mean.bit_length()))
        sb.write(param, 4)
        _rice_write(sb, res, param)
        sb.align()
        frame = hdr + bytes(sb.buf)
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
