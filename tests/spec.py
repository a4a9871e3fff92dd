"""Naive single-threaded executable spec of HBase read semantics.

A direct, obviously-correct Python model of ScanQueryMatcher /
ScanDeleteTracker / version tracking (SURVEY.md §5.2 item 4) used as
the oracle for property-based tests of hbase_spark.operators.resolve.
Intentionally O(n^2)-ish and simple.
"""

from __future__ import annotations

from hbase_spark.model import CellType

# cell = dict(row, family, qualifier, ts, type, value, seq)


def _knob(value, family, default):
    """Per-family knob access: dict → family's value (reference default
    when absent), scalar → itself."""
    if isinstance(value, dict):
        return value.get(family, default)
    return value


def _flag(value, family):
    if isinstance(value, (set, frozenset)):
        return family in value
    return value


def resolve_spec(
    cells: list[dict],
    *,
    versions: int | dict = 1,
    min_versions: int | dict = 0,
    as_of: int | None = None,
    time_range: tuple[int | None, int | None] | None = None,
    ttl_by_family: dict[str, int] | None = None,
    now: int | None = None,
    raw: bool = False,
    new_version_behavior: bool | set = False,
    keep_deleted_cells: bool | set = False,
) -> list[dict]:
    cs = [c for c in cells if as_of is None or c["ts"] <= as_of]

    def in_range(ts):
        if time_range is None:
            return True
        lo, hi = time_range
        return (lo is None or ts >= lo) and (hi is None or ts < hi)

    if raw:
        return [c for c in cs if in_range(c["ts"])]

    def expired(c):
        return (
            ttl_by_family is not None
            and c["family"] in ttl_by_family
            and c["ts"] < now - ttl_by_family[c["family"]]
        )

    if ttl_by_family:
        cs = [
            c
            for c in cs
            if _knob(min_versions, c["family"], 0) > 0 or not expired(c)
        ]

    puts = [c for c in cs if c["type"] == CellType.PUT]
    dels = [c for c in cs if c["type"] != CellType.PUT]
    if time_range is not None and time_range[1] is not None:
        dels = [
            d
            for d in dels
            if not _flag(keep_deleted_cells, d["family"])
            or d["ts"] < time_range[1]
        ]

    def deleted(p):
        for d in dels:
            if d["row"] != p["row"] or d["family"] != p["family"]:
                continue
            t = d["type"]
            if t == CellType.DELETE_FAMILY and p["ts"] <= d["ts"]:
                return True
            if t == CellType.DELETE_FAMILY_VERSION and p["ts"] == d["ts"]:
                return True
            if d["qualifier"] != p["qualifier"]:
                continue
            if t == CellType.DELETE_COLUMN and p["ts"] <= d["ts"]:
                return True
            if t == CellType.DELETE and p["ts"] == d["ts"]:
                if not _flag(new_version_behavior, p["family"]) or d["seq"] >= p["seq"]:
                    return True
        return False

    live = [p for p in puts if not deleted(p) and in_range(p["ts"])]

    by_col: dict[tuple, list[dict]] = {}
    for p in live:
        by_col.setdefault((p["row"], p["family"], p["qualifier"]), []).append(p)
    out = []
    for (row, family, qual), group in by_col.items():
        group.sort(key=lambda c: (-c["ts"], -c["seq"]))
        vcap = _knob(versions, family, 1)
        minv = _knob(min_versions, family, 0)
        for rank, c in enumerate(group[:vcap], start=1):
            # expired cells consume the slot but only survive while
            # rank <= min_versions (ScanWildcardColumnTracker:143)
            if not expired(c) or rank <= minv:
                out.append(c)
    return out


def key_set(cells: list[dict]) -> set[tuple]:
    return {
        (c["row"], c["family"], c["qualifier"], c["ts"], c["value"]) for c in cells
    }
