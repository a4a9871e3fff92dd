"""Comparators — the value algebra used by comparison filters
(SURVEY.md §2.5, reference files under hbase-client/.../filter/).

A comparator wraps the right-hand side of a comparison plus a
comparison style; ``matches(col, op)`` compiles (column <op> rhs) to a
Column predicate.  CompareOperator set per filter/CompareFilter.java:54:
LESS, LESS_OR_EQUAL, EQUAL, NOT_EQUAL, GREATER_OR_EQUAL, GREATER.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

OPS = ("<", "<=", "=", "!=", ">=", ">")

_OP_FN = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: a >= b,
    ">": lambda a, b: a > b,
}


def _norm_op(op: str) -> str:
    aliases = {
        "LESS": "<",
        "LESS_OR_EQUAL": "<=",
        "EQUAL": "=",
        "NOT_EQUAL": "!=",
        "GREATER_OR_EQUAL": ">=",
        "GREATER": ">",
        "==": "=",
    }
    op = aliases.get(op.upper(), op) if op.isalpha() or "_" in op else aliases.get(op, op)
    if op not in _OP_FN:
        raise ValueError(f"unknown CompareOperator {op!r}")
    return op


class Comparator:
    def matches(self, col: Column, op: str) -> Column:
        raise NotImplementedError


class BinaryComparator(Comparator):
    """Lexicographic compare — filter/BinaryComparator.java:38.

    Spark compares StringType and BinaryType lexicographically
    (BinaryType byte-wise unsigned, matching HBase's Bytes.compareTo).
    """

    def __init__(self, value):
        self.value = value

    def matches(self, col: Column, op: str) -> Column:
        return _OP_FN[_norm_op(op)](col, F.lit(self.value))


class BinaryPrefixComparator(Comparator):
    """Compare only up to the prefix length — BinaryPrefixComparator.java:37."""

    def __init__(self, prefix: str):
        self.prefix = prefix

    def matches(self, col: Column, op: str) -> Column:
        truncated = F.substring(col, 1, len(self.prefix))
        return _OP_FN[_norm_op(op)](truncated, F.lit(self.prefix))


class BinaryComponentComparator(Comparator):
    """Compare the bytes at a fixed offset (a struct field in a compound
    key) — BinaryComponentComparator.java:35.  ``offset`` is 0-based."""

    def __init__(self, value: str, offset: int):
        self.value = value
        self.offset = offset

    def matches(self, col: Column, op: str) -> Column:
        comp = F.substring(col, self.offset + 1, len(self.value))
        return _OP_FN[_norm_op(op)](comp, F.lit(self.value))


class BitComparator(Comparator):
    """Bitwise AND/OR/XOR test — BitComparator.java:35.

    EQUAL matches when (value <bitop> rhs) is non-zero; NOT_EQUAL when
    zero.  Operates on integer-rendered values (the reference operates
    on equal-length byte arrays; our canonical cells store numbers as
    decimal strings).
    """

    def __init__(self, value: int, bit_op: str):
        if bit_op.upper() not in ("AND", "OR", "XOR"):
            raise ValueError(f"bad bitwise op {bit_op!r}")
        self.value = int(value)
        self.bit_op = bit_op.upper()

    def matches(self, col: Column, op: str) -> Column:
        op = _norm_op(op)
        if op not in ("=", "!="):
            raise ValueError("BitComparator supports only EQUAL / NOT_EQUAL")
        x = col.try_cast("long")
        combined = {
            "AND": x.bitwiseAND(F.lit(self.value)),
            "OR": x.bitwiseOR(F.lit(self.value)),
            "XOR": x.bitwiseXOR(F.lit(self.value)),
        }[self.bit_op]
        nonzero = combined != 0
        return nonzero if op == "=" else ~nonzero


class LongComparator(Comparator):
    """Numeric long compare — LongComparator.java:36."""

    def __init__(self, value: int):
        self.value = int(value)

    def matches(self, col: Column, op: str) -> Column:
        return _OP_FN[_norm_op(op)](col.try_cast("long"), F.lit(self.value))


class BigDecimalComparator(Comparator):
    """Decimal compare — BigDecimalComparator.java:38."""

    def __init__(self, value, precision: int = 38, scale: int = 10):
        self.value = str(value)
        self.precision, self.scale = precision, scale

    def matches(self, col: Column, op: str) -> Column:
        t = f"decimal({self.precision},{self.scale})"
        return _OP_FN[_norm_op(op)](col.try_cast(t), F.lit(self.value).cast(t))


class NullComparator(Comparator):
    """Is-empty test — NullComparator.java:34."""

    def matches(self, col: Column, op: str) -> Column:
        op = _norm_op(op)
        isnull = col.isNull() | (F.length(col) == 0)
        if op == "=":
            return isnull
        if op == "!=":
            return ~isnull
        raise ValueError("NullComparator supports only EQUAL / NOT_EQUAL")


class RegexStringComparator(Comparator):
    """Regex match — RegexStringComparator.java:73 (JAVA engine; Spark's
    rlike is java.util.regex underneath, so patterns carry over)."""

    def __init__(self, pattern: str):
        self.pattern = pattern

    def matches(self, col: Column, op: str) -> Column:
        op = _norm_op(op)
        hit = col.rlike(self.pattern)
        if op == "=":
            return hit
        if op == "!=":
            return ~hit
        raise ValueError("RegexStringComparator supports only EQUAL / NOT_EQUAL")


class SubstringComparator(Comparator):
    """Case-insensitive contains — SubstringComparator.java:46."""

    def __init__(self, substr: str):
        self.substr = substr.lower()

    def matches(self, col: Column, op: str) -> Column:
        op = _norm_op(op)
        hit = F.lower(col).contains(self.substr)
        if op == "=":
            return hit
        if op == "!=":
            return ~hit
        raise ValueError("SubstringComparator supports only EQUAL / NOT_EQUAL")
