"""ParseFilter — the string filter language used by the reference's
shell/REST/Thrift gateways (filter/ParseFilter.java:48, registry
:52-100; grammar constants filter/ParseConstants.java:28).

Examples this parses, string-compatible with the reference:

    "RowFilter(>=, 'binary:row10')"
    "(RowFilter(>=,'binary:a') AND PageFilter(10)) OR SKIP ValueFilter(=,'substring:x')"
    "WHILE QualifierFilter(<, 'binary:q5')"

Grammar (precedence low->high, as in the reference):
    expr   := term (OR term)*
    term   := unary (AND unary)*
    unary  := (SKIP | WHILE) unary | '(' expr ')' | FilterName '(' args ')'
Comparator literals are 'comparatortype:value' with types
binary | binaryprefix | regexstring | substring (ParseConstants).
"""

from __future__ import annotations

import re

from hbase_spark.filters import filters as flt
from hbase_spark.filters.base import Filter
from hbase_spark.filters.comparators import (
    BinaryComparator,
    BinaryPrefixComparator,
    LongComparator,
    NullComparator,
    RegexStringComparator,
    SubstringComparator,
)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<str>'(?:[^']|'')*')
      | (?P<op><=|>=|!=|==|=|<|>)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
      | (?P<num>-?\d+(?:\.\d+)?)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str):
    toks, i = [], 0
    while i < len(s):
        m = _TOKEN.match(s, i)
        if not m:
            if s[i:].strip() == "":
                break
            raise ValueError(f"ParseFilter: bad token at {s[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "str":
            text = text[1:-1].replace("''", "'")
        toks.append((kind, text))
    return toks


def _comparator(spec: str):
    """'binary:abc' -> BinaryComparator('abc') etc. (ParseFilter.createComparator)."""
    if ":" in spec:
        kind, _, val = spec.partition(":")
        kind = kind.lower()
        if kind == "binary":
            return BinaryComparator(val)
        if kind == "binaryprefix":
            return BinaryPrefixComparator(val)
        if kind == "regexstring":
            return RegexStringComparator(val)
        if kind == "substring":
            return SubstringComparator(val)
        if kind == "long":
            return LongComparator(int(val))
        if kind == "null":
            return NullComparator()
    return BinaryComparator(spec)


def _bool(x) -> bool:
    return str(x).lower() == "true"


def _build(name: str, args: list):
    """Dispatch table ≈ ParseFilter's registry (ParseFilter.java:52-100),
    mirroring each filter's createFilterFromArguments signature."""
    n = name.lower()
    if n == "rowfilter":
        return flt.RowFilter(args[0], _comparator(args[1]))
    if n == "familyfilter":
        return flt.FamilyFilter(args[0], _comparator(args[1]))
    if n == "qualifierfilter":
        return flt.QualifierFilter(args[0], _comparator(args[1]))
    if n == "valuefilter":
        return flt.ValueFilter(args[0], _comparator(args[1]))
    if n == "columnvaluefilter":
        return flt.ColumnValueFilter(args[0], args[1], args[2], _comparator(args[3]))
    if n == "singlecolumnvaluefilter":
        f = flt.SingleColumnValueFilter(
            args[0], args[1], args[2], _comparator(args[3])
        )
        if len(args) > 4:
            f.filter_if_missing = _bool(args[4])
        if len(args) > 5:
            f.latest_version_only = _bool(args[5])
        return f
    if n == "singlecolumnvalueexcludefilter":
        f = flt.SingleColumnValueExcludeFilter(
            args[0], args[1], args[2], _comparator(args[3])
        )
        if len(args) > 4:
            f.filter_if_missing = _bool(args[4])
        if len(args) > 5:
            f.latest_version_only = _bool(args[5])
        return f
    if n == "dependentcolumnfilter":
        if len(args) <= 3:
            drop = _bool(args[2]) if len(args) > 2 else False
            return flt.DependentColumnFilter(args[0], args[1], drop_dependent_column=drop)
        return flt.DependentColumnFilter(
            args[0],
            args[1],
            drop_dependent_column=_bool(args[2]),
            op=args[3],
            comparator=_comparator(args[4]),
        )
    if n == "prefixfilter":
        return flt.PrefixFilter(args[0])
    if n == "columnprefixfilter":
        return flt.ColumnPrefixFilter(args[0])
    if n == "multiplecolumnprefixfilter":
        return flt.MultipleColumnPrefixFilter(args)
    if n == "columnrangefilter":
        return flt.ColumnRangeFilter(args[0], _bool(args[1]), args[2], _bool(args[3]))
    if n == "columnpaginationfilter":
        return flt.ColumnPaginationFilter(int(args[0]), int(args[1]))
    if n == "columncountgetfilter":
        return flt.ColumnCountGetFilter(int(args[0]))
    if n == "pagefilter":
        return flt.PageFilter(int(args[0]))
    if n == "inclusivestopfilter":
        return flt.InclusiveStopFilter(args[0])
    if n == "multirowrangefilter":
        rngs = [
            (args[i] or None, True, args[i + 1] or None, False)
            for i in range(0, len(args), 2)
        ]
        return flt.MultiRowRangeFilter(rngs)
    if n == "timestampsfilter":
        return flt.TimestampsFilter([int(a) for a in args])
    if n == "keyonlyfilter":
        return flt.KeyOnlyFilter(_bool(args[0]) if args else False)
    if n == "firstkeyonlyfilter":
        return flt.FirstKeyOnlyFilter()
    if n == "randomrowfilter":
        return flt.RandomRowFilter(float(args[0]))
    raise ValueError(f"ParseFilter: unknown filter {name!r}")


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"ParseFilter: expected {kind}, got {k}:{v!r}")
        return v

    def parse_expr(self) -> Filter:
        left = self.parse_term()
        parts = [left]
        while self.peek() == ("word", "OR"):
            self.next()
            parts.append(self.parse_term())
        return parts[0] if len(parts) == 1 else flt.FilterList("OR", parts)

    def parse_term(self) -> Filter:
        parts = [self.parse_unary()]
        while self.peek() == ("word", "AND"):
            self.next()
            parts.append(self.parse_unary())
        return parts[0] if len(parts) == 1 else flt.FilterList("AND", parts)

    def parse_unary(self) -> Filter:
        k, v = self.peek()
        if (k, v) == ("word", "SKIP"):
            self.next()
            return flt.SkipFilter(self.parse_unary())
        if (k, v) == ("word", "WHILE"):
            self.next()
            return flt.WhileMatchFilter(self.parse_unary())
        if k == "lparen":
            self.next()
            e = self.parse_expr()
            self.expect("rparen")
            return e
        if k == "word":
            self.next()
            self.expect("lparen")
            args = []
            while self.peek()[0] != "rparen":
                kk, vv = self.next()
                if kk is None:
                    raise ValueError(f"ParseFilter: unterminated argument list for {v!r}")
                if kk == "comma":
                    continue
                args.append(vv)
            self.expect("rparen")
            return _build(v, args)
        raise ValueError(f"ParseFilter: unexpected token {k}:{v!r}")


def parse_filter(s: str) -> Filter:
    """Parse a reference-compatible filter string into a Filter tree."""
    p = _Parser(_tokenize(s))
    out = p.parse_expr()
    if p.i != len(p.toks):
        raise ValueError(f"ParseFilter: trailing tokens near {p.toks[p.i:]}")
    return out
