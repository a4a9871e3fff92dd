"""Cell-level visibility labels — the one read-time *evaluator* in the
reference's scalar surface (SURVEY.md §2.8): each cell may carry a
label expression like ``"A & (B | C)"`` checked against the reader's
authorization set (server/security/visibility/
VisibilityController.java:123; expression grammar in
server/security/visibility/expression/).

Scale shape: label expressions are policies, not data — their
cardinality is tiny relative to the cell count.  So we evaluate each
DISTINCT expression once driver-side against the auth set and filter
the cell stream with an ``isin`` over the admitted expressions: the
per-cell work is a hash probe inside codegen, and no Python ever sees
a cell.

Grammar: ident | '!' expr | expr '&' expr | expr '|' expr | '(' expr ')'
with precedence ! > & > | (matching the reference's operator set).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOK = re.compile(r"\s*([A-Za-z0-9_.\-]+|[!&|()])")


def _tokenize(expr: str) -> list[str]:
    out, i = [], 0
    while i < len(expr):
        m = _TOK.match(expr, i)
        if not m:
            if expr[i:].strip() == "":
                break
            raise ValueError(f"bad visibility token at {expr[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


class _P:
    def __init__(self, toks: list[str], auths: frozenset[str]):
        self.t, self.i, self.auths = toks, 0, auths

    def peek(self):
        return self.t[self.i] if self.i < len(self.t) else None

    def expr(self) -> bool:  # OR level
        v = self.term()
        while self.peek() == "|":
            self.i += 1
            v = self.term() or v
        return v

    def term(self) -> bool:  # AND level
        v = self.unary()
        while self.peek() == "&":
            self.i += 1
            v = self.unary() and v
        return v

    def unary(self) -> bool:
        tok = self.peek()
        if tok == "!":
            self.i += 1
            return not self.unary()
        if tok == "(":
            self.i += 1
            v = self.expr()
            if self.peek() != ")":
                raise ValueError("unbalanced ( in visibility expression")
            self.i += 1
            return v
        if tok is None or tok in "&|)":
            raise ValueError(f"unexpected token {tok!r} in visibility expression")
        self.i += 1
        return tok in self.auths


def evaluate(expr: str | None, auths) -> bool:
    """True if a reader holding ``auths`` may see a cell labeled
    ``expr``.  Unlabeled cells (None/empty) are public, like cells
    written without visibility in the reference."""
    if expr is None or expr.strip() == "":
        return True
    p = _P(_tokenize(expr), frozenset(auths))
    v = p.expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in visibility expression {expr!r}")
    return v


# (plan semantic hash, label col, auth set, cap) -> admitted labels.
# Policies change on catalog timescales, not query timescales, so an
# interactive session asking the same frame N questions should pay the
# distinct-label collect once, not N times.
_ADMITTED_CACHE: dict = {}
_ADMITTED_CACHE_MAX = 256


def _distinct_labels(
    cells: DataFrame, label_col: str, max_policies: int
) -> list[str]:
    rows = (
        cells.select(F.col(label_col).alias("_lbl"))
        .filter(F.col("_lbl").isNotNull() & (F.col("_lbl") != ""))
        .distinct()
        .limit(max_policies + 1)
        .collect()
    )
    if len(rows) > max_policies:
        raise ValueError(
            f"more than max_policies={max_policies} distinct visibility "
            "expressions — the label column looks data-derived; raise "
            "max_policies if the ACL surface is genuinely this wide"
        )
    return [r["_lbl"] for r in rows]


def visible(
    cells: DataFrame,
    auths,
    label_col: str = "labels",
    *,
    max_policies: int = 65536,
    cache: bool = True,
) -> DataFrame:
    """Filter a CellFrame to the cells the auth set may see.

    Label expressions are POLICIES, not data: their cardinality is the
    ACL surface, not the cell count.  So the distinct expressions are
    collected (bounded by ``max_policies`` — the capped-contract rule
    every skew-sensitive operator here follows), each is evaluated
    ONCE on the driver with the shared parser, and the admitted set
    becomes a single codegen set-membership probe over the cell
    stream.  No Python function runs on any executor and no join
    enters the plan — the per-cell cost is one hash probe inside
    whole-stage codegen (pre-r7 this was the repo's last row-path
    ``F.udf``, an executor Python round-trip per distinct label).

    A data-derived label column with more than ``max_policies``
    distinct expressions raises instead of silently collecting an
    unbounded set — raise the cap explicitly if your ACL surface
    really is that wide (the driver evaluation itself is microseconds
    per expression).

    BEHAVIOR NOTE (since r7): the distinct-label scan runs EAGERLY at
    plan-build time — callers that previously built fully-lazy plans
    over label columns wider than ``max_policies`` now fail fast at
    ``visible()`` instead of at first action.  The scan is memoized
    per (frame plan, label column, auth set, cap): repeated calls on
    the same table in an interactive session collect the distinct
    labels once.  ``cache=False`` forces a re-scan when the label
    column's contents have changed under an identical plan (e.g. a
    re-read of a mutated external path).
    """
    auth_set = frozenset(auths)
    key = None
    if cache:
        try:
            key = (cells.semanticHash(), label_col, auth_set, max_policies)
        except Exception:  # noqa: BLE001 — cache is best-effort
            key = None
    if key is not None and key in _ADMITTED_CACHE:
        admitted = _ADMITTED_CACHE[key]
    else:
        labels = _distinct_labels(cells, label_col, max_policies)
        admitted = [s for s in labels if evaluate(s, auth_set)]
        if key is not None:
            if len(_ADMITTED_CACHE) >= _ADMITTED_CACHE_MAX:
                _ADMITTED_CACHE.clear()
            _ADMITTED_CACHE[key] = admitted
    is_public = F.col(label_col).isNull() | (F.col(label_col) == "")
    if not admitted:
        return cells.filter(is_public)
    return cells.filter(is_public | F.col(label_col).isin(admitted))
