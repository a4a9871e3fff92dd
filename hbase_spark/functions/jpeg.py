"""JPEG (JFIF) codec in pure Python + numpy.

Decode supports baseline sequential DCT (SOF0/1) — generic DQT/DHT
tables, 8-bit samples, 1 or 3 components, any sampling factors
(4:4:4 / 4:2:2 / 4:2:0), restart markers — AND progressive DCT
(SOF2): spectral selection, successive approximation for DC and AC
(first + refinement scans), EOB runs, per ITU T.81 G.1.2/G.2.
Arithmetic coding and lossless modes raise at the seam.

Encode writes baseline 4:4:4 (or 4:2:0) and, via
``encode_jpeg_progressive``, a six-scan progressive stream with the
standard successive-approximation scan script; both carry canonical
fixed-length Huffman tables built from the symbols actually emitted
(any table is legal as long as the DHT segment declares it — the
decoder is table-generic), making the implementation self-contained
without the spec's Annex K constants.  Baseline and progressive
encodes of one image quantize identically, so their decodes agree
bit-for-bit — the equivalence the tests pin.

This exists so the multimodal decode seam (functions/multimodal.py)
is provably real for the dominant training-corpus image format with
no native image library in the container.  Throughput note: pure
Python entropy decode is the slow path — at production scale plug a
C decoder into the same seam; correctness and the Arrow-batched
plumbing are what this proves.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _idct2(block):
    return _A.T @ block @ _A


def _fdct2(block):
    return _A @ block @ _A.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at markers (returns them via .marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.acc, self.nbits = 0, 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a marker terminates the entropy stream
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def align_to_marker(self):
        """Consume the pending RST marker and realign to a byte."""
        self.acc, self.nbits, self.marker = 0, 0, None
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, n: int) -> int:
    """F.2.2.1 EXTEND: map the n-bit magnitude to a signed value."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


class _Huff:
    """Canonical Huffman table -> (maxlen, {(len, code): sym}) plus a
    fast 16-bit lookup built lazily from DHT bits/values."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut = np.zeros(1 << 16, np.int32) - 1
        self.lln = np.zeros(1 << 16, np.int32)
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                sym = vals[k]
                k += 1
                lo = code << (16 - ln)
                hi = lo + (1 << (16 - ln))
                self.lut[lo:hi] = sym
                self.lln[lo:hi] = ln
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        w = br.peek16()
        sym, ln = int(self.lut[w]), int(self.lln[w])
        if sym < 0:
            raise ValueError("invalid Huffman code in entropy stream")
        br.skip(ln)
        return sym


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG payload -> HxWx3 uint8 RGB array
    (grayscale replicates to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        m = data[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    tbl = np.frombuffer(
                        body[i : i + 128], ">u2"
                    ).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                i += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": m == 0xC2}
            if m == 0xC2:
                _alloc_coefs(frame)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG are "
                "supported at this seam"
            )
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif m == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scomp = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scomp.append({"id": cs, "dc": tt >> 4, "ac": tt & 15})
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            pos = pos + 2 + seglen
            if frame is not None and frame.get("progressive"):
                pos = _decode_progressive_scan(
                    data, pos, frame, scomp, huff_dc, huff_ac,
                    restart_interval, ss, se, ahal >> 4, ahal & 15,
                )
                frame["nscans"] = frame.get("nscans", 0) + 1
                continue
            return _decode_scan(
                data, pos, frame, scomp, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += 2 + seglen
    if (
        frame is not None
        and frame.get("progressive")
        and frame.get("nscans", 0) > 0
    ):
        return _reconstruct_progressive(frame, qt)
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, frame, scomp, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for sc in scomp:
        c = by_id[sc["id"]]
        c["dc_t"], c["ac_t"] = sc["dc"], sc["ac"]
        c["pred"] = 0
        c["plane"] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64
        )
    br = _BitReader(data, pos)
    order = [by_id[sc["id"]] for sc in scomp]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_to_marker()
                for c in order:
                    c["pred"] = 0
            mcu_count += 1
            for c in order:
                dct, act = huff_dc[c["dc_t"]], huff_ac[c["ac_t"]]
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, np.int32)
                        t = dct.decode(br)
                        diff = _extend(br.receive(t), t)
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(br.receive(s), s)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = coef * q
                        px = _idct2(blk.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = px
    planes = []
    for c in order:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(p[:h, :w])
    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=2).round(), 0, 255
    ).astype(np.uint8)


# ----------------------------------------------- progressive (SOF2)
#
# Coefficients accumulate across scans in zigzag order per block;
# reconstruction (dequant + IDCT + upsample + color) happens once at
# EOI.  Spectral selection, successive approximation (DC and AC first
# + refinement scans), EOB runs, and restart intervals per ITU T.81
# G.1.2 / G.2.


def _alloc_coefs(frame) -> None:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    frame["mcux"], frame["mcuy"] = mcux, mcuy
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
        # non-interleaved block grid (component's true sample dims)
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)


def _refine_nonzero(coef, br, k, se, p1, m1) -> None:
    """Correction bits for already-nonzero coefficients in [k, se]
    (coefficients are stored in zigzag order, like the baseline path)."""
    for i in range(k, se + 1):
        v = coef[i]
        if v and br.receive(1) and (v & p1) == 0:
            coef[i] = v + (p1 if v > 0 else m1)


def _decode_progressive_scan(
    data, pos, frame, scomp, huff_dc, huff_ac, dri, ss, se, ah, al
):
    by_id = {c["id"]: c for c in frame["comps"]}
    order = [by_id[sc["id"]] for sc in scomp]
    for c, sc in zip(order, scomp):
        c["dc_t"], c["ac_t"] = sc["dc"], sc["ac"]
        c["pred"] = 0
    br = _BitReader(data, pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al

    def maybe_restart(n):
        nonlocal eobrun
        if dri and n and n % dri == 0:
            br.align_to_marker()
            eobrun = 0
            for c in order:
                c["pred"] = 0

    if ss == 0:  # DC scan (interleaved MCU order)
        n = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                maybe_restart(n)
                n += 1
                for c in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            coef = c["coef"][my * c["v"] + v,
                                             mx * c["h"] + hh]
                            if ah == 0:
                                t = huff_dc[c["dc_t"]].decode(br)
                                diff = _extend(br.receive(t), t)
                                c["pred"] += diff
                                coef[0] = c["pred"] << al
                            else:
                                if br.receive(1):
                                    coef[0] |= p1
        return br.pos
    # AC scan — always one component, non-interleaved block order
    c = order[0]
    act = huff_ac[c["ac_t"]]
    n = 0
    for byi in range(c["bh"]):
        for bxi in range(c["bw"]):
            maybe_restart(n)
            n += 1
            coef = c["coef"][byi, bxi]
            if ah == 0:  # first AC scan for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = act.decode(br)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            break
                        k += 16
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC index overflow")
                    coef[k] = _extend(br.receive(s), s) << al
                    k += 1
            else:  # AC refinement
                if eobrun:
                    eobrun -= 1
                    _refine_nonzero(coef, br, ss, se, p1, m1)
                    continue
                k = ss
                while k <= se:
                    rs = act.decode(br)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.receive(r)
                            _refine_nonzero(coef, br, k, se, p1, m1)
                            k = se + 1
                            break
                        newval = 0
                    else:
                        newval = p1 if br.receive(1) else m1
                    while k <= se:
                        v = coef[k]
                        if v:
                            if br.receive(1) and (v & p1) == 0:
                                coef[k] = v + (p1 if v > 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        coef[k] = newval
                    k += 1
    return br.pos


def _reconstruct_progressive(frame, qt):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        by, bx = c["coef"].shape[:2]
        plane = np.zeros((by * 8, bx * 8), np.float64)
        for yy in range(by):
            for xx in range(bx):
                blk = np.zeros(64, np.float64)
                blk[ZIGZAG] = c["coef"][yy, xx] * q
                plane[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8] = (
                    _idct2(blk.reshape(8, 8)) + 128.0
                )
        if c["h"] < hmax or c["v"] < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0),
                hmax // c["h"], axis=1,
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.stack([r, g, b], axis=2).round(), 0, 255
    ).astype(np.uint8)


# ------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def put(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # 1-pad
        return bytes(self.out)


def _mag(v: int) -> tuple[int, int]:
    """(size, magnitude bits) for a signed coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s, v if v > 0 else v + (1 << s) - 1


def _canonical_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Fixed-length canonical Huffman table over the used symbols:
    every symbol gets length L = ceil(log2(n+1)) (the +1 keeps the
    all-ones code unused, as baseline decoders expect).  Returns
    (bits[16], values, {sym: (code, len)})."""
    vals = sorted(symbols)
    n = len(vals)
    ln = max(1, (n + 1 - 1).bit_length())
    if (1 << ln) - 1 < n:
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = n
    codes = {sym: (i, ln) for i, sym in enumerate(vals)}
    return bits, bytes(vals), codes


def _block_symbols(coef: np.ndarray, pred: int) -> tuple[list, int]:
    """Zigzag block -> [(kind, sym, extra_bits, extra_len)] plus the
    new DC predictor."""
    out = []
    s, mbits = _mag(int(coef[0]) - pred)
    out.append(("dc", s, mbits, s))
    run = 0
    last = 63
    while last > 0 and coef[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            out.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s, mbits = _mag(v)
        out.append(("ac", (run << 4) | s, mbits, s))
        run = 0
    if last < 63:
        out.append(("ac", 0x00, 0, 0))  # EOB
    return out, int(coef[0])


def _plane_blocks(p: np.ndarray, q: np.ndarray, ph: int, pw: int):
    """Pad a plane to (ph, pw) by edge replication and return the 2D
    grid of quantized zigzag blocks."""
    h, w = p.shape
    pad = np.empty((ph, pw), np.float64)
    pad[:h, :w] = p
    pad[h:, :w] = p[h - 1 : h, :]
    pad[:, w:] = pad[:, w - 1 : w]
    grid = []
    for by in range(0, ph, 8):
        row = []
        for bx in range(0, pw, 8):
            f = _fdct2(pad[by : by + 8, bx : bx + 8] - 128.0)
            row.append(np.round(f.reshape(64)[ZIGZAG] / q).astype(np.int32))
        grid.append(row)
    return grid


def encode_jpeg(pixels, quality_q: int = 1, *, subsample: bool = False) -> bytes:
    """Encode an HxWx3 uint8 RGB array (or nested lists) as baseline
    JFIF — 4:4:4 by default, 4:2:0 with ``subsample=True`` (chroma
    2x2-mean downsampled; exercises the decoder's upsampling path).
    ``quality_q`` is the flat quantization step (1 = near-lossless,
    16 ≈ mid quality)."""
    img = np.asarray(pixels, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    q = np.full(64, int(quality_q), np.int32)
    if subsample:
        he, we = h + (h & 1), w + (w & 1)  # even-pad before 2x2 mean
        sub = []
        for p in (cb, cr):
            pe = np.empty((he, we), np.float64)
            pe[:h, :w] = p
            pe[h:, :w] = p[h - 1 : h, :]
            pe[:, w:] = pe[:, w - 1 : w]
            sub.append(pe.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3)))
        cb, cr = sub
        samp = [(2, 2), (1, 1), (1, 1)]
        mw, mh = 16, 16
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        mw, mh = 8, 8
    mcux, mcuy = -(-w // mw), -(-h // mh)
    grids = []
    for (hf, vf), p in zip(samp, (y, cb, cr)):
        grids.append(
            _plane_blocks(p, q, mcuy * vf * 8, mcux * hf * 8)
        )
    # emission order: per MCU, each component's vf x hf blocks
    emit: list[tuple[int, int, int]] = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hf, vf) in enumerate(samp):
                for v in range(vf):
                    for hh in range(hf):
                        emit.append((ci, my * vf + v, mx * hf + hh))
    # pass 1: symbol frequencies along the emission order
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    preds = [0, 0, 0]
    for ci, by, bx in emit:
        t = 0 if ci == 0 else 1
        syms, preds[ci] = _block_symbols(grids[ci][by][bx], preds[ci])
        for kind, sym, _, _ in syms:
            (dc_syms if kind == "dc" else ac_syms)[t].add(sym)
    tables = []
    for t in range(2):
        tables.append(
            (_canonical_table(dc_syms[t]), _canonical_table(ac_syms[t]))
        )
    # pass 2: entropy-code the same order
    bw = _BitWriter()
    preds = [0, 0, 0]
    for ci, by, bx in emit:
        t = 0 if ci == 0 else 1
        (_, _, dc_codes), (_, _, ac_codes) = tables[t]
        syms, preds[ci] = _block_symbols(grids[ci][by][bx], preds[ci])
        for kind, sym, extra, elen in syms:
            code, ln = (dc_codes if kind == "dc" else ac_codes)[sym]
            bw.put(code, ln)
            if elen:
                bw.put(extra, elen)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qzz = np.zeros(64, np.uint8)
    qzz[:] = quality_q  # flat table: identical in any coefficient order
    out += seg(0xDB, bytes([0x00]) + qzz.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3,
         1, (samp[0][0] << 4) | samp[0][1], 0,
         2, 0x11, 0,
         3, 0x11, 0]
    )
    out += seg(0xC0, sof)
    for t in range(2):
        (db, dv, _), (ab, av, _) = tables[t]
        out += seg(0xC4, bytes([0x00 | t]) + bytes(db) + dv)
        out += seg(0xC4, bytes([0x10 | t]) + bytes(ab) + av)
    out += seg(
        0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    return out + entropy + b"\xff\xd9"


# ------------------------------------------- progressive encoder
#
# Scan script: interleaved DC first (Al=1) + DC refinement, then per
# component an AC first scan (Ss=1..63, Al=1) and an AC refinement
# scan (Ah=1, Al=0) — exercising every progressive scan kind (spectral
# selection, successive approximation, EOB runs) that the decoder
# implements.  4:4:4 only; blocks are zigzag-ordered as everywhere.


def _prog_dc_first(grids, mcux, mcuy, sym, bits):
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                v = int(grids[ci][my][mx][0]) >> 1  # Al=1 (arith shift)
                s, mb = _mag(v - preds[ci])
                preds[ci] = v
                sym("dc", t, s)
                bits(mb, s)


def _prog_dc_refine(grids, mcux, mcuy, sym, bits):
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                bits(int(grids[ci][my][mx][0]) & 1, 1)


def _flush_eobrun(t, sym, bits, eobrun):
    if eobrun:
        r = eobrun.bit_length() - 1
        sym("ac", t, r << 4)
        bits(eobrun - (1 << r), r)
    return 0


def _prog_ac_first(grid, t, sym, bits):
    """First AC scan for one component: values at Al=1 (magnitude
    shift), run-length coded with EOB runs."""
    eobrun = 0
    for row in grid:
        for coefz in row:
            va = [0] * 64
            last = 0
            for k in range(1, 64):
                v = int(coefz[k])
                va[k] = (abs(v) >> 1) * (1 if v > 0 else -1)
                if va[k]:
                    last = k
            if last == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(t, sym, bits, eobrun)
                continue
            eobrun = _flush_eobrun(t, sym, bits, eobrun)
            run = 0
            for k in range(1, last + 1):
                v = va[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sym("ac", t, 0xF0)
                    run -= 16
                s, mb = _mag(v)
                sym("ac", t, (run << 4) | s)
                bits(mb, s)
                run = 0
            if last < 63:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(t, sym, bits, eobrun)
    _flush_eobrun(t, sym, bits, eobrun)


def _prog_ac_refine(grid, t, sym, bits):
    """AC refinement scan (Ah=1 -> Al=0), mirroring the decoder walk:
    newly-significant +/-1 coefficients with zero-history run counts,
    correction bits for nonzero-history positions interleaved in the
    spans the decoder reads them, EOB runs carrying buffered bits."""
    eobrun = 0
    pending: list[int] = []

    def flush():
        nonlocal eobrun, pending
        eobrun = _flush_eobrun(t, sym, bits, eobrun)
        for b in pending:
            bits(b, 1)
        pending = []

    for row in grid:
        for coefz in row:
            hist = [0] * 64
            corr = [0] * 64
            newsig = []
            for k in range(1, 64):
                v = int(coefz[k])
                hist[k] = (abs(v) >> 1) * (1 if v > 0 else -1)
                corr[k] = abs(v) & 1
                if hist[k] == 0 and v != 0:
                    newsig.append(k)
            if not newsig:
                eobrun += 1
                pending.extend(corr[k] for k in range(1, 64) if hist[k])
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            k = 1
            for j in newsig:
                # zero-history run length in [k, j)
                zr = sum(
                    1 for i in range(k, j) if hist[i] == 0
                )
                while zr > 15:
                    # ZRL span: up to and including the 16th
                    # zero-history position; corrections for nonzero
                    # positions inside the span follow the symbol
                    seen, m = 0, k
                    while True:
                        if hist[m] == 0:
                            seen += 1
                            if seen == 16:
                                break
                        m += 1
                    sym("ac", t, 0xF0)
                    for i in range(k, m):
                        if hist[i]:
                            bits(corr[i], 1)
                    k = m + 1
                    zr -= 16
                sym("ac", t, (zr << 4) | 1)
                bits(1 if int(coefz[j]) > 0 else 0, 1)
                for i in range(k, j):
                    if hist[i]:
                        bits(corr[i], 1)
                k = j + 1
            tail = [corr[i] for i in range(k, 64) if hist[i]]
            if k <= 63:
                eobrun += 1
                pending.extend(tail)
                if eobrun == 0x7FFF:
                    flush()
    flush()


def encode_jpeg_progressive(pixels, quality_q: int = 1) -> bytes:
    """Encode an HxWx3 uint8 RGB array as PROGRESSIVE JFIF (SOF2,
    4:4:4) with the standard successive-approximation scan script —
    the same quantized coefficients as ``encode_jpeg``, delivered
    across six scans, so baseline and progressive decodes of one image
    agree exactly."""
    img = np.asarray(pixels, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    q = np.full(64, int(quality_q), np.int32)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    grids = [
        _plane_blocks(p, q, mcuy * 8, mcux * 8) for p in (y, cb, cr)
    ]

    # scan list: (runner, sos_body); tables referenced by (kind, id)
    scans = [
        (lambda s_, b_: _prog_dc_first(grids, mcux, mcuy, s_, b_),
         bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01])),
        (lambda s_, b_: _prog_dc_refine(grids, mcux, mcuy, s_, b_),
         bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x10])),
    ]
    for ci, comp_id in ((0, 1), (1, 2), (2, 3)):
        t = 0 if ci == 0 else 1
        scans.append(
            (lambda s_, b_, ci=ci, t=t: _prog_ac_first(grids[ci], t, s_, b_),
             bytes([1, comp_id, t << 4 | t, 1, 63, 0x01]))
        )
    for ci, comp_id in ((0, 1), (1, 2), (2, 3)):
        t = 0 if ci == 0 else 1
        scans.append(
            (lambda s_, b_, ci=ci, t=t: _prog_ac_refine(grids[ci], t, s_, b_),
             bytes([1, comp_id, t << 4 | t, 1, 63, 0x10]))
        )

    # pass 1: collect symbols per (kind, table id)
    used: dict[tuple, set] = {("dc", 0): set(), ("dc", 1): set(),
                              ("ac", 0): set(), ("ac", 1): set()}
    for runner, _ in scans:
        runner(lambda kind, t, s: used[(kind, t)].add(s),
               lambda v, n: None)
    tables = {
        key: _canonical_table(syms or {0}) for key, syms in used.items()
    }

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qzz = np.zeros(64, np.uint8)
    qzz[:] = quality_q
    out += seg(0xDB, bytes([0x00]) + qzz.tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    out += seg(0xC2, sof)
    for t in range(2):
        db, dv, _ = tables[("dc", t)]
        ab, av, _ = tables[("ac", t)]
        out += seg(0xC4, bytes([0x00 | t]) + bytes(db) + dv)
        out += seg(0xC4, bytes([0x10 | t]) + bytes(ab) + av)

    # pass 2: emit each scan with its own entropy stream
    for runner, sos in scans:
        out += seg(0xDA, sos)
        bw = _BitWriter()

        def emit_sym(kind, t, s, bw=bw):
            code, ln = tables[(kind, t)][2][s]
            bw.put(code, ln)

        runner(emit_sym, lambda v, n, bw=bw: bw.put(v, n) if n else None)
        out += bw.flush()
    return out + b"\xff\xd9"
