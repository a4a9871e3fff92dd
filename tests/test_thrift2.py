"""Thrift2 gateway (thrift2/hbase.thrift THBaseService;
ThriftHBaseServiceHandler.java + ThriftServer): the full data-plane
service surface, exercised BOTH in-process and through a live socket
speaking the hand-rolled TBinaryProtocol wire format
(hbase_spark/thrift_wire.py) — every test in this module runs twice,
once per transport, so handler semantics and wire encode/decode are
pinned by the same assertions."""

import shutil
import tempfile

import pytest

from hbase_spark.admin import Admin
from hbase_spark.shell import shell_put
from hbase_spark.thrift2 import (
    TAppend,
    TColumn,
    TColumnIncrement,
    TColumnValue,
    TDelete,
    TDeleteType,
    TGet,
    THBaseServiceHandler,
    TIncrement,
    TPut,
    TScan,
    TTimeRange,
    serve,
)


@pytest.fixture(scope="module", params=["inproc", "wire"])
def handler(spark, request):
    d = tempfile.mkdtemp(prefix="hb_thrift_")
    admin = Admin(spark, d)
    admin.register_regionservers(["rs1.example.com,16020,1"])
    admin.create_table("tt", ["f", "g"])
    t = admin.table("tt")
    for i in range(10):
        t = shell_put(t, f"r{i:02d}", "f:q", f"v{i}", ts=100 + i, seq=i)
    t = shell_put(t, "r00", "g:x", "gx", ts=300, seq=20)
    admin.flush("tt", t, num_regions=2)
    h = THBaseServiceHandler(admin)
    if request.param == "inproc":
        yield h
    else:
        from hbase_spark.thrift_wire import ThriftClient

        server = serve(h, port=0)  # framed TBinaryProtocol socket
        client = ThriftClient(server.host, server.port)
        client.mode = "wire"
        try:
            yield client
        finally:
            client.close()
            server.stop()
    shutil.rmtree(d, ignore_errors=True)


def test_get_exists_and_shapes(handler):
    res = handler.get("tt", TGet(row="r00"))
    assert res.row == "r00"
    cols = {(c.family, c.qualifier): c.value for c in res.columnValues}
    assert cols == {("f", "q"): "v0", ("g", "x"): "gx"}
    assert handler.exists("tt", TGet(row="r00")) is True
    assert handler.exists("tt", TGet(row="nope")) is False
    assert handler.existsAll(
        "tt", [TGet(row="r01"), TGet(row="zz")]
    ) == [True, False]
    # column projection + timerange
    res = handler.get("tt", TGet(
        row="r00", columns=[TColumn("g", "x")],
        timeRange=TTimeRange(300, 301),
    ))
    assert [c.value for c in res.columnValues] == ["gx"]
    # filterString: the ParseFilter surface
    res = handler.get("tt", TGet(
        row="r00", filterString="QualifierFilter(=, 'binary:q')"
    ))
    assert {c.qualifier for c in res.columnValues} == {"q"}
    assert handler.get("tt", TGet(row="nope")).row is None


def test_get_multiple_uses_one_semi_join_for_plain_gets(handler):
    out = handler.getMultiple(
        "tt", [TGet(row="r02"), TGet(row="zz"), TGet(row="r03")]
    )
    assert [r.row for r in out] == ["r02", None, "r03"]


def test_put_checkandput_roundtrip(handler):
    handler.put("tt", TPut(row="p1", columnValues=[
        TColumnValue("f", "q", "put1", timestamp=500),
    ]))
    assert handler.get("tt", TGet(row="p1")).columnValues[0].value == "put1"
    # guard mismatch -> no write
    ok = handler.checkAndPut("tt", "p1", "f", "q", "WRONG", TPut(
        row="p1", columnValues=[TColumnValue("f", "q", "put2",
                                             timestamp=501)],
    ))
    assert ok is False
    # guard match -> write
    ok = handler.checkAndPut("tt", "p1", "f", "q", "put1", TPut(
        row="p1", columnValues=[TColumnValue("f", "q", "put2",
                                             timestamp=502)],
    ))
    assert ok is True
    assert handler.get("tt", TGet(row="p1")).columnValues[0].value == "put2"
    # absence guard (value=None — rides the wire as an ABSENT field 5)
    ok = handler.checkAndPut("tt", "p1", "f", "absent", None, TPut(
        row="p1", columnValues=[TColumnValue("f", "absent", "a",
                                             timestamp=503)],
    ))
    assert ok is True


def test_delete_single_and_multiple(handler):
    handler.putMultiple("tt", [
        TPut(row="d1", columnValues=[TColumnValue("f", "a", "1",
                                                  timestamp=600),
                                     TColumnValue("f", "b", "2",
                                                  timestamp=600)]),
        TPut(row="d2", columnValues=[TColumnValue("f", "a", "3",
                                                  timestamp=600)]),
    ])
    # column-scoped delete (DELETE_COLUMNS: all versions)
    handler.deleteSingle("tt", TDelete(
        row="d1", columns=[TColumn("f", "a")],
        deleteType=TDeleteType.DELETE_COLUMNS,
    ))
    cols = {c.qualifier for c in
            handler.get("tt", TGet(row="d1")).columnValues}
    assert cols == {"b"}
    # whole-row delete + batch form
    failed = handler.deleteMultiple("tt", [TDelete(row="d1"),
                                           TDelete(row="d2")])
    assert failed == []
    assert handler.exists("tt", TGet(row="d1")) is False
    assert handler.exists("tt", TGet(row="d2")) is False


def test_family_level_delete_and_put_after_delete(handler):
    import time

    handler.put("tt", TPut(row="fd", columnValues=[
        TColumnValue("f", "a", "1"), TColumnValue("f", "b", "2"),
        TColumnValue("g", "x", "3"),
    ]))
    # TColumn WITHOUT qualifier = family-level delete (DELETE_FAMILY):
    # every cell of family f goes, family g survives
    handler.deleteSingle("tt", TDelete(
        row="fd", columns=[TColumn(family="f")],
        deleteType=TDeleteType.DELETE_FAMILY,
    ))
    res = handler.get("tt", TGet(row="fd"))
    assert {(c.family, c.qualifier) for c in res.columnValues} == {("g", "x")}
    # put-after-delete with server stamps: the shared wall-clock
    # domain means the tombstone cannot mask the later unstamped put
    time.sleep(0.002)
    handler.put("tt", TPut(row="fd", columnValues=[
        TColumnValue("f", "a", "back"),
    ]))
    res = handler.get("tt", TGet(row="fd"))
    assert {(c.family, c.qualifier, c.value) for c in res.columnValues} == {
        ("f", "a", "back"), ("g", "x", "3"),
    }


def test_delete_column_without_ts_deletes_newest_version(handler):
    handler.putMultiple("tt", [
        TPut(row="dv", columnValues=[TColumnValue("f", "v", "old",
                                                  timestamp=100)]),
        TPut(row="dv", columnValues=[TColumnValue("f", "v", "new",
                                                  timestamp=200)]),
    ])
    # DELETE_COLUMN (single version) with no ts: the reference deletes
    # the NEWEST version — the older one becomes visible again
    handler.deleteSingle("tt", TDelete(
        row="dv", columns=[TColumn("f", "v")],
        deleteType=TDeleteType.DELETE_COLUMN,
    ))
    res = handler.get("tt", TGet(row="dv"))
    assert [(c.value, c.timestamp) for c in res.columnValues] == [
        ("old", 100)
    ]
    # deleting a nonexistent column is a no-op, not a stray tombstone
    handler.deleteSingle("tt", TDelete(
        row="dv", columns=[TColumn("f", "ghost")],
        deleteType=TDeleteType.DELETE_COLUMN,
    ))
    assert handler.exists("tt", TGet(row="dv")) is True


def test_put_timestamp_zero_is_honored(handler):
    handler.put("tt", TPut(row="z0", columnValues=[
        TColumnValue("f", "q", "epoch", timestamp=0),
    ]))
    res = handler.get("tt", TGet(row="z0", timeRange=TTimeRange(0, 1)))
    assert res.columnValues[0].timestamp == 0


def test_increment_append_return_results(handler):
    handler.increment("tt", TIncrement(
        row="ctr", columns=[TColumnIncrement("f", "n", 5)],
    ))
    res = handler.increment("tt", TIncrement(
        row="ctr", columns=[TColumnIncrement("f", "n", 3)],
    ))
    assert res.row == "ctr"  # returnResults default true
    assert int(res.columnValues[0].value) == 8
    res = handler.append("tt", TAppend(
        row="app", columns=[TColumnValue("f", "s", "abc")],
    ))
    assert res.columnValues[0].value == "abc"
    res = handler.append("tt", TAppend(
        row="app", columns=[TColumnValue("f", "s", "def")],
        returnResults=False,
    ))
    assert res.row is None
    assert handler.get(
        "tt", TGet(row="app")
    ).columnValues[0].value == "abcdef"


def test_scanner_lifecycle_and_stateless_scan(handler):
    sid = handler.openScanner("tt", TScan(
        startRow="r02", stopRow="r07",
        columns=[TColumn("f", "q")],
        filterString="ValueFilter(!=, 'binary:v4')",
    ))
    got = []
    while True:
        batch = handler.getScannerRows(sid, 2)
        if not batch:
            break
        got.extend(c.value for r in batch for c in r.columnValues)
    handler.closeScanner(sid)
    assert got == ["v2", "v3", "v5", "v6"]
    # ValueError in-process; TIllegalArgument (a ValueError subclass,
    # decoded off result-struct field 2) over the wire
    with pytest.raises(ValueError, match="invalid scanner"):
        handler.getScannerRows(sid, 1)
    # stateless one-shot
    out = handler.getScannerResults("tt", TScan(
        startRow="r00", stopRow="r03", columns=[TColumn("f", "q")],
    ), numRows=100)
    assert [r.row for r in out] == ["r00", "r01", "r02"]
    # reversed scan
    out = handler.getScannerResults("tt", TScan(
        startRow="r05", stopRow="r08", columns=[TColumn("f", "q")],
        reversed=True,
    ), numRows=100)
    assert [r.row for r in out] == ["r07", "r06", "r05"]


def test_region_locations(handler):
    loc = handler.getRegionLocation("tt", "r01")
    assert loc.serverName == "rs1.example.com,16020,1"
    locs = handler.getAllRegionLocations("tt")
    assert len(locs) >= 2
    assert all(lc.serverName for lc in locs)
    if getattr(handler, "mode", "inproc") == "wire":
        # the wire shape is the IDL's TServerName + THRegionInfo;
        # region start/end keys survive the round-trip
        assert loc.regionInfo["table"] == "tt"
        assert all("start_key" in lc.regionInfo for lc in locs)
    else:
        assert loc.regionInfo["region_file"]


def test_scanner_numrows_counts_rows_not_cells(handler):
    """The IDL's numRows counts TResults (whole rows): a multi-column
    row must never split across batches as partial TResults (round-10
    review — the prior cell budget did exactly that)."""
    sid = handler.openScanner("tt", TScan(startRow="r00", stopRow="r02"))
    batch = handler.getScannerRows(sid, 1)
    assert len(batch) == 1
    assert batch[0].row == "r00"
    # r00 has cells in BOTH families — one TResult carries them all
    assert {(c.family, c.qualifier) for c in batch[0].columnValues} == {
        ("f", "q"), ("g", "x"),
    }
    batch2 = handler.getScannerRows(sid, 5)
    assert [r.row for r in batch2] == ["r01"]
    assert handler.getScannerRows(sid, 5) == []
    handler.closeScanner(sid)
