"""Shell-flavored convenience surface (hbase-shell parity,
hbase-shell/src/main/ruby/shell/commands/ — scan/get/put/delete/count
with HBase shell keyword arguments re-expressed as Python kwargs).

The JRuby shell's ``scan 't', STARTROW => 'a', FILTER => "..."``
becomes ``shell_scan(table, STARTROW='a', FILTER="...")``.  Filters
are ParseFilter strings (the same language the shell accepts);
COLUMNS use the shell's 'family:qualifier' form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from hbase_spark.operators.scan import Scan
from hbase_spark.table import Table


def _columns(cols: list[str] | None):
    """'fam:qual' shell column specs -> (families, qualifiers)."""
    if not cols:
        return None, None
    fams, quals = set(), set()
    for c in cols:
        if ":" in c:
            f, q = c.split(":", 1)
            fams.add(f)
            quals.add(q)
        else:
            fams.add(c)
    return sorted(fams) or None, (sorted(quals) or None)


def shell_scan(
    table: Table,
    *,
    STARTROW=None,
    STOPROW=None,
    COLUMNS: list[str] | None = None,
    FILTER: str | None = None,
    LIMIT: int | None = None,
    REVERSED: bool = False,
    VERSIONS: int = 1,
    TIMERANGE: tuple | None = None,
    RAW: bool = False,
) -> DataFrame:
    """hbase-shell `scan` (shell/commands/scan.rb argument surface)."""
    families, qualifiers = _columns(COLUMNS)
    return table.scan(
        Scan(
            start_row=STARTROW,
            stop_row=STOPROW,
            families=families,
            qualifiers=qualifiers,
            filter=FILTER,
            limit=LIMIT,
            reversed=REVERSED,
            versions=VERSIONS,
            time_range=TIMERANGE,
            raw=RAW,
        )
    )


def shell_get(table: Table, row, *, COLUMNS: list[str] | None = None) -> DataFrame:
    out = table.get(row)
    families, qualifiers = _columns(COLUMNS)
    if families:
        out = out.filter(out.family.isin(families))
    if qualifiers:
        out = out.filter(out.qualifier.isin(qualifiers))
    return out


def shell_put(table: Table, row, column: str, value, *, ts: int, seq: int) -> Table:
    fam, qual = column.split(":", 1)
    return table.put([(row, fam, qual, value)], ts=ts, seq=seq)


def shell_delete(table: Table, row, column: str, *, ts: int, seq: int) -> Table:
    fam, qual = column.split(":", 1)
    return table.delete([(row, fam, qual)], ts=ts, seq=seq)


def shell_count(table: Table) -> int:
    """shell `count` (hbase-shell table.rb:321 uses FirstKeyOnly+KeyOnly;
    here: distinct visible row keys)."""
    return table.count()
