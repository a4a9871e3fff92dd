"""Typed byte codecs — the reference's two sanctioned codec layers
(SURVEY.md §1.2) re-expressed for Spark.

1. ``Bytes``-compatible big-endian primitive codecs
   (common/util/Bytes.java: toBytes(long) :678, toBytes(String) :643)
   — NOT order-preserving for signed numerics, byte-compatible with
   fixtures written by the reference.
2. ``OrderedBytes``-style order-preserving encodings
   (common/util/OrderedBytes.java:297; typed wrappers in
   common/types/ — OrderedInt64, OrderedFloat64, OrderedString) —
   unsigned byte-lexicographic order of the encoding == value order.
   Spark compares BinaryType lexicographically *unsigned*, exactly the
   comparison HBase applies to row keys, so these encodings make
   binary row keys range-scannable and range-prunable.
3. ``struct_key`` — the Struct/StructBuilder compound-row-key analog
   (common/types/Struct.java): concatenation of order-preserving
   fields, so the tuple sorts correctly under the byte comparator.

Each codec exists twice with identical output: a Spark ``Column``
expression (JVM-side, for bulk encode/decode in a plan) and a plain
Python function (driver-side, for building Scan start/stop keys).
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIGN = -0x8000000000000000  # long sign bit, as a (negative) Python int
_TWO63 = 1 << 63
_TWO64 = 1 << 64

# ---------------------------------------------------------------------------
# Bytes-compatible big-endian codecs (common/util/Bytes.java)
# ---------------------------------------------------------------------------


def bytes_from_long(col: Column) -> Column:
    """Bytes.toBytes(long) (Bytes.java:678): 8-byte big-endian two's
    complement.  hex() of a long is already big-endian two's complement."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 16, "0"))


def bytes_to_long(col: Column) -> Column:
    """Bytes.toLong: decode 8-byte big-endian two's complement."""
    dec = F.conv(F.hex(col), 16, 10).cast("decimal(20,0)")
    two63 = F.lit(str(_TWO63)).cast("decimal(20,0)")
    two64 = F.lit(str(_TWO64)).cast("decimal(21,0)")
    signed = F.when(dec >= two63, (dec - two64).cast("decimal(20,0)")).otherwise(dec)
    return signed.cast("long")


def bytes_from_string(col: Column) -> Column:
    """Bytes.toBytes(String) (Bytes.java:643): UTF-8 bytes."""
    return F.encode(col, "UTF-8")


def bytes_to_string(col: Column) -> Column:
    return F.decode(col, "UTF-8")


def py_bytes_from_long(v: int) -> bytes:
    return _struct.pack(">q", v)


def py_bytes_to_long(b: bytes) -> int:
    return _struct.unpack(">q", b)[0]


# ---------------------------------------------------------------------------
# OrderedBytes-style order-preserving codecs (common/util/OrderedBytes.java)
# ---------------------------------------------------------------------------


def ordered_from_long(col: Column) -> Column:
    """OrderedInt64: flip the sign bit so unsigned byte order == signed
    numeric order (OrderedBytes.java encodeInt64)."""
    return F.unhex(F.lpad(F.hex(col.cast("long").bitwiseXOR(F.lit(_SIGN))), 16, "0"))


def ordered_to_long(col: Column) -> Column:
    return bytes_to_long(col).bitwiseXOR(F.lit(_SIGN))


def ordered_from_double(col: Column) -> Column:
    """OrderedFloat64 (OrderedBytes.java encodeFloat64): IEEE-754 bits
    with sign-dependent flip — negatives flip all bits, positives flip
    the sign bit — making byte order follow numeric order (NaN sorts
    last, like the reference)."""
    bits = F.reflect(
        F.lit("java.lang.Double"), F.lit("doubleToRawLongBits"), col.cast("double")
    ).cast("long")
    flipped = (
        F.when(bits < 0, bits.bitwiseXOR(F.lit(-1)))
        .otherwise(bits.bitwiseXOR(F.lit(_SIGN)))
        .cast("long")
    )
    return F.unhex(F.lpad(F.hex(flipped), 16, "0"))


def ordered_from_string(col: Column) -> Column:
    """OrderedString (OrderedBytes.java encodeString): UTF-8 body plus a
    0x00 terminator so a shorter string sorts before its extensions and
    the next struct field can't bleed in.  (The reference escapes
    embedded NULs; we require NUL-free input — enforced in the Python
    twin, documented here.)"""
    return F.concat(F.encode(col, "UTF-8"), F.lit(b"\x00"))


def py_ordered_from_long(v: int) -> bytes:
    return _struct.pack(">Q", (v ^ _SIGN) & (_TWO64 - 1))


def py_ordered_to_long(b: bytes) -> int:
    w = _struct.unpack(">Q", b)[0] ^ _TWO63
    return w - _TWO64 if w >= _TWO63 else w


def py_ordered_from_double(v: float) -> bytes:
    bits = _struct.unpack(">q", _struct.pack(">d", v))[0]
    flipped = (bits ^ -1) if bits < 0 else (bits ^ _SIGN)
    return _struct.pack(">Q", flipped & (_TWO64 - 1))


def py_ordered_from_string(s: str) -> bytes:
    if "\x00" in s:
        raise ValueError("ordered string encoding requires NUL-free input")
    return s.encode("utf-8") + b"\x00"


# ---------------------------------------------------------------------------
# Struct — compound row keys (common/types/Struct.java)
# ---------------------------------------------------------------------------

_ENCODERS = {
    "long": ordered_from_long,
    "double": ordered_from_double,
    "string": ordered_from_string,
}
_PY_ENCODERS = {
    "long": py_ordered_from_long,
    "double": py_ordered_from_double,
    "string": py_ordered_from_string,
}


def struct_key(*fields: tuple[Column, str]) -> Column:
    """Compound order-preserving row key: concat of ordered encodings,
    sorts as the field tuple (Struct.java / StructBuilder.java).

    fields = (column, kind) pairs, kind in {'long','double','string'}.
    """
    return F.concat(*[_ENCODERS[kind](col) for col, kind in fields])


def py_struct_key(*fields: tuple[object, str]) -> bytes:
    """Driver-side twin of struct_key — for Scan start/stop boundaries."""
    return b"".join(_PY_ENCODERS[kind](v) for v, kind in fields)
