"""EXIF metadata: parse, and strip, JPEG APPn/COM segments.

The image-side PII pass of a multimodal curation pipeline: camera
EXIF blocks routinely carry GPS coordinates, device serials, and
timestamps — the image analog of the text pipeline's ``redact_pii``.
Two halves, mirroring pii_stats/redact_pii:

- ``parse_exif`` reads the APP1 Exif block (TIFF container, both
  byte orders, IFD0 → Exif IFD → GPS IFD) into a flat dict — the
  DETECTION half that feeds audit columns;
- ``strip_metadata`` removes APP1..APP15 and COM segments from the
  byte stream without touching the entropy-coded image data — the
  REDACTION half.  Decoders ignore APPn, so pixels are unchanged
  (pinned by test: decode(strip(x)) == decode(x)).

Pure byte-level segment walk on top of the public JPEG (ITU T.81)
and TIFF 6.0 / Exif 2.3 layouts — no entropy decode needed, so
stripping costs O(header), not O(pixels).  ``encode_exif`` builds a
spec-shaped APP1 block for lossless fixtures (the media-codec
fixture discipline).

Corrupt-payload policy (the shared seam contract): a payload that is
not a JPEG raises ValueError; a structurally truncated TIFF raises;
an absent Exif block parses to None (absence is data, not an error).
"""

from __future__ import annotations

import struct

# tag ids (Exif 2.3 / TIFF 6.0)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DATETIME_ORIGINAL = 0x9003
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

# TIFF field types: (struct code, byte size)
_TYPES = {1: ("B", 1), 2: (None, 1), 3: ("H", 2), 4: ("I", 4), 5: (None, 8)}


def _build_ifd(entries, base, endian):
    """Serialize one IFD at offset ``base`` (within the TIFF area).
    ``entries`` = [(tag, type, values)]; returns (ifd_bytes,
    data_bytes) where data lands right after the IFD."""
    e = "<" if endian == b"II" else ">"
    n = len(entries)
    data_off = base + 2 + 12 * n + 4
    head = struct.pack(e + "H", n)
    body = b""
    data = b""
    for tag, typ, values in sorted(entries):
        if typ == 2:  # ASCII
            raw = values.encode() + b"\x00"
            count = len(raw)
        elif typ == 5:  # RATIONAL pairs
            raw = b"".join(
                struct.pack(e + "II", num, den) for num, den in values
            )
            count = len(values)
        else:
            code, size = _TYPES[typ]
            raw = b"".join(struct.pack(e + code, v) for v in values)
            count = len(values)
        if len(raw) <= 4:
            val = raw + b"\x00" * (4 - len(raw))
        else:
            val = struct.pack(e + "I", data_off + len(data))
            data += raw
        body += struct.pack(e + "HHI", tag, typ, count) + val
    return head + body + struct.pack(e + "I", 0), data


def encode_exif(
    *,
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime_original: str | None = None,
    lat: float | None = None,
    lon: float | None = None,
    endian: bytes = b"II",
) -> bytes:
    """Fixture encoder: a complete APP1 segment (marker + length +
    ``Exif\\0\\0`` + TIFF) holding the given fields; GPS coordinates
    become the spec's degree/minute/second RATIONAL triples."""
    ifd0 = []
    if make is not None:
        ifd0.append((_TAG_MAKE, 2, make))
    if model is not None:
        ifd0.append((_TAG_MODEL, 2, model))
    if orientation is not None:
        ifd0.append((_TAG_ORIENTATION, 3, [orientation]))
    exif_entries = []
    if datetime_original is not None:
        exif_entries.append((_TAG_DATETIME_ORIGINAL, 2, datetime_original))
    gps_entries = []
    if lat is not None or lon is not None:
        def dms(v):
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10_000)
            return [(d, 1), (m, 1), (s, 10_000)]

        # Partial fixes are valid EXIF (and the reason has_gps flags on
        # either coordinate) — emit whichever coordinates were given.
        if lat is not None:
            gps_entries += [
                (_GPS_LAT_REF, 2, "N" if lat >= 0 else "S"),
                (_GPS_LAT, 5, dms(lat)),
            ]
        if lon is not None:
            gps_entries += [
                (_GPS_LON_REF, 2, "E" if lon >= 0 else "W"),
                (_GPS_LON, 5, dms(lon)),
            ]
    e = "<" if endian == b"II" else ">"

    # lay out: header(8) | IFD0+data | [Exif IFD+data] | [GPS IFD+data]
    # pointer values depend on sizes, which depend only on entry
    # counts and value lengths — compute with placeholder pointers,
    # then rebuild with the real ones (sizes are pointer-independent).
    def build(exif_ptr, gps_ptr):
        entries = list(ifd0)
        if exif_entries:
            entries.append((_TAG_EXIF_IFD, 4, [exif_ptr]))
        if gps_entries:
            entries.append((_TAG_GPS_IFD, 4, [gps_ptr]))
        ifd, data = _build_ifd(entries, 8, endian)
        return ifd + data

    ifd0_block = build(0, 0)
    off = 8 + len(ifd0_block)
    exif_block = b""
    if exif_entries:
        i, d = _build_ifd(exif_entries, off, endian)
        exif_block = i + d
    gps_off = off + len(exif_block)
    gps_block = b""
    if gps_entries:
        i, d = _build_ifd(gps_entries, gps_off, endian)
        gps_block = i + d
    ifd0_block = build(off if exif_entries else 0,
                       gps_off if gps_entries else 0)
    tiff = endian + struct.pack(e + "HI", 42, 8) + ifd0_block
    tiff += exif_block + gps_block
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Fixture helper: splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def _read_ifd(tiff: bytes, off: int, e: str) -> dict:
    """One IFD -> {tag: decoded value(s)}; offsets resolve into the
    full TIFF area."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset past the TIFF block")
    (n,) = struct.unpack_from(e + "H", tiff, off)
    out = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            raise ValueError("EXIF: truncated IFD entry")
        tag, typ, count = struct.unpack_from(e + "HHI", tiff, base)
        if typ not in _TYPES:
            continue  # unknown field type: skip per TIFF 6.0 readers
        _, size = _TYPES[typ]
        nbytes = size * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", tiff, base + 8)
        if voff + nbytes > len(tiff):
            raise ValueError("EXIF: value offset past the TIFF block")
        raw = tiff[voff:voff + nbytes]
        if typ == 2:
            out[tag] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 5:
            out[tag] = [
                struct.unpack_from(e + "II", raw, 8 * k) for k in range(count)
            ]
        else:
            code, _ = _TYPES[typ]
            vals = list(struct.unpack_from(e + code * count, raw))
            out[tag] = vals if count > 1 else vals[0]
    return out


def _segments(jpeg: bytes):
    """Yield (marker, start, end) for every pre-SOS segment; the scan
    stops at SOS (entropy-coded data follows, verbatim).  T.81 allows
    any number of 0xFF fill bytes before a marker — skip them (the
    yielded span starts at the final 0xFF, so removing a span never
    also removes the padding that may belong to the stream)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("EXIF: bad marker alignment in header")
        while jpeg[pos + 1] == 0xFF and pos + 5 <= len(jpeg):
            pos += 1  # fill byte
        m = jpeg[pos + 1]
        if m == 0xDA:  # SOS
            return
        if m == 0x01 or 0xD0 <= m <= 0xD9:  # standalone markers
            pos += 2
            continue
        seglen = int.from_bytes(jpeg[pos + 2:pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            # Truncation raises here so strip_metadata shares the same
            # corrupt-payload contract parse_exif enforces via _read_ifd
            # bounds checks — a declared length past EOF must not be
            # silently treated as "segment removed".
            raise ValueError("EXIF: segment length runs past end of payload")
        yield m, pos, pos + 2 + seglen
        pos = pos + 2 + seglen


def parse_exif(jpeg: bytes) -> dict | None:
    """The APP1 Exif block as a flat dict — make, model, orientation,
    datetime_original, and GPS decoded to signed decimal degrees
    (lat, lon) — or None when the image carries no Exif block."""
    for m, s, t in _segments(jpeg):
        if m == 0xE1 and jpeg[s + 4:s + 10] == b"Exif\x00\x00":
            tiff = jpeg[s + 10:t]
            break
    else:
        return None
    if tiff[:2] not in (b"II", b"MM"):
        raise ValueError("EXIF: bad TIFF byte-order mark")
    e = "<" if tiff[:2] == b"II" else ">"
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    ifd0 = _read_ifd(tiff, ifd0_off, e)
    out = {
        "make": ifd0.get(_TAG_MAKE),
        "model": ifd0.get(_TAG_MODEL),
        "orientation": ifd0.get(_TAG_ORIENTATION),
        "datetime_original": None,
        "lat": None,
        "lon": None,
    }
    if _TAG_EXIF_IFD in ifd0:
        sub = _read_ifd(tiff, ifd0[_TAG_EXIF_IFD], e)
        out["datetime_original"] = sub.get(_TAG_DATETIME_ORIGINAL)
    if _TAG_GPS_IFD in ifd0:
        gps = _read_ifd(tiff, ifd0[_TAG_GPS_IFD], e)

        def deg(trip, ref, neg):
            if trip is None or ref is None:
                return None
            v = sum(
                (num / den if den else 0.0) / f
                for (num, den), f in zip(trip, (1, 60, 3600))
            )
            return -v if ref in neg else v

        out["lat"] = deg(gps.get(_GPS_LAT), gps.get(_GPS_LAT_REF), ("S",))
        out["lon"] = deg(gps.get(_GPS_LON), gps.get(_GPS_LON_REF), ("W",))
    return out


def strip_metadata(
    jpeg: bytes,
    *,
    keep_app0: bool = True,
    keep_markers: tuple = (0xE2, 0xEE),
) -> tuple[bytes, int]:
    """Remove metadata APPn and COM segments; entropy-coded data
    copies verbatim.  Returns (clean_bytes, segments_removed).

    By default APP0 (JFIF), APP2 (ICC profile), and APP14 (the Adobe
    color-transform flag) are KEPT: they carry color interpretation,
    not PII, and dropping APP14 makes decoders misread Adobe/YCCK
    component layouts — which would break the pixels-unchanged
    guarantee.  Everything else that is removed (APP1 EXIF/XMP, other
    APPn, COM) is ignored by decoders, so decoded pixels are
    byte-identical before and after.  Tighten or loosen with
    ``keep_markers`` (full marker bytes, e.g. 0xE2 for APP2)."""
    keep = set(keep_markers) | ({0xE0} if keep_app0 else set())
    drop_spans = []
    for m, s, t in _segments(jpeg):
        removable = (
            (0xE0 <= m <= 0xEF) or m == 0xFE
        ) and m not in keep
        if removable:
            drop_spans.append((s, t))
    if not drop_spans:
        return jpeg, 0
    out = []
    pos = 0
    for s, t in drop_spans:
        out.append(jpeg[pos:s])
        pos = t
    out.append(jpeg[pos:])
    return b"".join(out), len(drop_spans)
