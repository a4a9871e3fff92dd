"""Property law (round-9 verdict task 3): random mutation sequences
through the gateway surfaces — THBaseServiceHandler and the REST row
CRUD — leave EXACTLY the state the same mutations produce through the
batch Table API.

The round-9 review fixed six semantic bug classes on these paths
(ts-domain splits between puts and deletes, delete-kind no-ops,
TOCTOU checkAndPut, put-after-delete masking); this law pins the
class shut: all 4 delete kinds x ts given/absent x interleaved puts
and increments, with the gateway's server clock made deterministic so
the batch twin can stamp identical cells.

The twin translates each gateway op to Table.put/delete/increment the
way the IDL documents it (NOT by calling the handler's own mapping —
an independent re-derivation, so a mapping bug cannot cancel out):

* TColumnValue.timestamp absent        -> the server clock value
* TDelete DELETE_FAMILY (no qualifier) -> CellType.DELETE_FAMILY <= ts
* TDelete DELETE_FAMILY_VERSION        -> exact-ts family tombstone;
  ts absent -> the family's newest visible version (no-op if none)
* TDelete DELETE_COLUMN (+qualifier)   -> one-version tombstone;
  ts absent -> the column's newest visible version (no-op if none)
* TDelete DELETE_COLUMNS (+qualifier)  -> all-versions tombstone <= ts
* TIncrement                           -> Table.increment at the clock

Examples are few but each is adversarial: one hot row, two families,
colliding explicit timestamps below AND above the clock domain.
"""

import functools
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_spark.admin import Admin
from hbase_spark.model import CellType
from hbase_spark.thrift2 import (
    TColumn,
    TColumnIncrement,
    TColumnValue,
    TDelete,
    TDeleteType,
    TGet,
    THBaseServiceHandler,
    TIncrement,
    TPut,
)

ROWS = ["rA", "rB"]
FAMS = ["f", "g"]
QUALS = ["q", "s"]
# explicit stamps straddle the deterministic clock (starts at 20_000):
# 1 and 15_000 sit below every clock value, 90_000 above all of them
TS = st.one_of(st.none(), st.sampled_from([1, 15_000, 90_000]))

_put = st.tuples(
    st.just("put"), st.sampled_from(ROWS), st.sampled_from(FAMS),
    st.sampled_from(QUALS), st.sampled_from(["v1", "v2"]), TS,
)
_delete = st.tuples(
    st.just("del"), st.sampled_from(ROWS), st.sampled_from(FAMS),
    st.one_of(st.none(), st.sampled_from(QUALS)),
    st.sampled_from([
        TDeleteType.DELETE_COLUMN, TDeleteType.DELETE_COLUMNS,
        TDeleteType.DELETE_FAMILY, TDeleteType.DELETE_FAMILY_VERSION,
    ]),
    TS,
)
_incr = st.tuples(
    st.just("incr"), st.sampled_from(ROWS), st.sampled_from(FAMS),
    st.just("n"), st.integers(min_value=1, max_value=5),
)
OPS = st.lists(st.one_of(_put, _delete, _incr), min_size=2, max_size=4)


class _Clock:
    """Deterministic server clock: strictly increasing, remembers the
    last value dispensed so the twin can stamp the identical cell."""

    def __init__(self, start: int = 20_000) -> None:
        self.t = start
        self.last = start

    def __call__(self) -> int:
        self.t += 7
        self.last = self.t
        return self.t


def _newest_ts(table, row, family, qualifier):
    """The newest VISIBLE version's timestamp (the reference's
    delete-latest resolution), derived from the twin's own state."""
    from pyspark.sql import functions as F

    cond = F.col("family") == family
    if qualifier is not None:
        cond = cond & (F.col("qualifier") == qualifier)
    hit = (table.get(row).filter(cond)
           .orderBy(F.col("ts").desc()).select("ts").take(1))
    return int(hit[0]["ts"]) if hit else None


def _twin_delete_plan(twin, row, fam, qual, dtype, ts):
    """Pre-op half of the IDL's TDelete contract: resolve anything
    that depends on the PRE-delete state (the newest visible version
    for exact-version kinds with no explicit ts).  Returns
    (kind, explicit_ts_or_None, skip)."""
    if qual is None:
        if dtype == TDeleteType.DELETE_FAMILY_VERSION:
            cts = ts if ts is not None else _newest_ts(twin, row, fam, None)
            return CellType.DELETE_FAMILY_VERSION, cts, cts is None
        return CellType.DELETE_FAMILY, ts, False
    if dtype == TDeleteType.DELETE_COLUMN:
        cts = ts if ts is not None else _newest_ts(twin, row, fam, qual)
        return CellType.DELETE, cts, cts is None
    return CellType.DELETE_COLUMN, ts, False


def _one_region_flushes(admin: Admin) -> None:
    """Speed knob, not semantics: gateway flushes default to 32 region
    partitions — physical layout only.  The laws assert cell-level
    state, so 1 region per flush cuts ~30x the task count."""
    admin.flush = functools.partial(admin.flush, num_regions=1)


def _final_state(table):
    return sorted(
        (r["row"], r["family"], r["qualifier"], int(r["ts"]),
         str(r["value"]))
        for r in table.snapshot(versions=5)
        .select("row", "family", "qualifier", "ts", "value").collect()
    )


@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=OPS)
def test_thrift_mutations_equal_batch_twin(spark, ops):
    d = tempfile.mkdtemp(prefix="hb_gwlaw_t_")
    try:
        admin = Admin(spark, d)
        admin.register_regionservers(["rs1.example.com,16020,1"])
        admin.create_table("gw", FAMS)
        admin.create_table("tw", FAMS)
        _one_region_flushes(admin)
        handler = THBaseServiceHandler(admin)
        clock = _Clock()
        handler._now_ms = clock  # deterministic server clock
        twin = admin.table("tw")
        seq = 0
        for op in ops:
            seq += 1
            if op[0] == "put":
                _, row, fam, qual, val, ts = op
                handler.put("gw", TPut(row=row, columnValues=[
                    TColumnValue(fam, qual, val, timestamp=ts),
                ]))
                twin = twin.put(
                    [(row, fam, qual, val)],
                    ts=ts if ts is not None else clock.last, seq=seq,
                )
            elif op[0] == "incr":
                _, row, fam, qual, amount = op
                handler.increment("gw", TIncrement(
                    row=row, columns=[TColumnIncrement(fam, qual, amount)],
                    returnResults=False,
                ))
                twin = twin.increment(
                    [(row, fam, qual, amount)], ts=clock.last, seq=seq
                )
            else:
                _, row, fam, qual, dtype, ts = op
                # newest-visible-version resolution must see the
                # PRE-delete state; the clock stamp must be the value
                # the handler dispenses DURING the delete — so plan
                # first, run the gateway op, then stamp the twin
                kind, cts, skip = _twin_delete_plan(
                    twin, row, fam, qual, dtype, ts
                )
                handler.deleteSingle("gw", TDelete(
                    row=row, columns=[TColumn(fam, qual)],
                    timestamp=ts, deleteType=dtype,
                ))
                if not skip:
                    twin = twin.delete(
                        [(row, fam, qual)],
                        ts=cts if cts is not None else clock.last,
                        seq=seq, kind=kind,
                    )
        assert _final_state(admin.table("gw")) == _final_state(twin)
        # visibility agrees too (exists() is a distinct plan)
        for row in ROWS:
            assert handler.exists("gw", TGet(row=row)) == bool(
                twin.get(row).take(1)
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- REST row CRUD ----------------------------------------------------------

_rput = st.tuples(
    st.just("put"), st.sampled_from(ROWS), st.sampled_from(FAMS),
    st.sampled_from(QUALS), st.sampled_from(["v1", "v2"]), TS,
)
_rdelcol = st.tuples(
    st.just("delcol"), st.sampled_from(ROWS), st.sampled_from(FAMS),
    st.sampled_from(QUALS), TS,
)
_rdelrow = st.tuples(st.just("delrow"), st.sampled_from(ROWS))
REST_OPS = st.lists(st.one_of(_rput, _rdelcol, _rdelrow),
                    min_size=2, max_size=4)


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=REST_OPS)
def test_rest_row_crud_equals_batch_twin(spark, ops):
    import base64
    import json
    import urllib.request

    from hbase_spark.rest import start_rest_gateway
    from hbase_spark.shell import shell_deleteall

    def b64(s):
        return base64.b64encode(s.encode()).decode()

    d = tempfile.mkdtemp(prefix="hb_gwlaw_r_")
    gw = None
    try:
        admin = Admin(spark, d)
        admin.register_regionservers(["rs1.example.com,16020,1"])
        admin.create_table("gw", FAMS)
        admin.create_table("tw", FAMS)
        _one_region_flushes(admin)
        gw = start_rest_gateway(admin)
        clock = _Clock()
        gw._now_ms = clock  # deterministic server clock
        twin = admin.table("tw")
        seq = 0
        for op in ops:
            seq += 1
            if op[0] == "put":
                _, row, fam, qual, val, ts = op
                cell = {"column": b64(f"{fam}:{qual}"), "$": b64(val)}
                if ts is not None:
                    cell["timestamp"] = ts
                req = urllib.request.Request(
                    f"{gw.base_url}/gw/{row}",
                    data=json.dumps(
                        {"Row": [{"key": b64(row), "Cell": [cell]}]}
                    ).encode(),
                    method="PUT",
                    headers={"Content-Type": "application/json"},
                )
                urllib.request.urlopen(req).close()
                twin = twin.put(
                    [(row, fam, qual, val)],
                    ts=ts if ts is not None else clock.last, seq=seq,
                )
            elif op[0] == "delcol":
                _, row, fam, qual, ts = op
                url = f"{gw.base_url}/gw/{row}/{fam}:{qual}"
                if ts is not None:
                    url += f"/{ts}"
                urllib.request.urlopen(
                    urllib.request.Request(url, method="DELETE")
                ).close()
                # RowResource DELETE col = shell delete: all versions
                # <= ts (DELETE_COLUMN kind), server clock when absent
                twin = twin.delete(
                    [(row, fam, qual)],
                    ts=ts if ts is not None else clock.last, seq=seq,
                    kind=CellType.DELETE_COLUMN,
                )
            else:
                _, row = op
                urllib.request.urlopen(urllib.request.Request(
                    f"{gw.base_url}/gw/{row}", method="DELETE"
                )).close()
                twin = shell_deleteall(twin, row, ts=clock.last, seq=seq)
        assert _final_state(admin.table("gw")) == _final_state(twin)
    finally:
        if gw is not None:
            gw.stop()
        shutil.rmtree(d, ignore_errors=True)
