"""REST gateway (hbase-rest Stargate protocol, JSON representation).

Drives a real HTTP server end-to-end with urllib: table list, schema
CRUD, namespaces, regions, row CRUD + multiget, stateful scanners
with Location headers and 204-on-exhaustion — the rest/model JSON
shapes (CellSetModel / RowModel / CellModel base64 wire form)."""

import base64
import json
import shutil
import tempfile
import urllib.error
import urllib.request

import pytest

from hbase_spark.admin import Admin
from hbase_spark.rest import start_rest_gateway
from hbase_spark.shell import shell_put


def _b64e(s):
    return base64.b64encode(s.encode()).decode()


def _b64d(s):
    return base64.b64decode(s).decode()


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
            return resp.status, dict(resp.headers), (
                json.loads(raw) if raw else None
            )
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), None


@pytest.fixture(scope="module")
def gateway(spark):
    d = tempfile.mkdtemp(prefix="hb_rest_")
    admin = Admin(spark, d)
    admin.create_table("rt", ["f", "g"])
    t = admin.table("rt")
    for i in range(8):
        t = shell_put(t, f"row-{i}", "f:q", f"v{i}", ts=100 + i, seq=i)
    t = shell_put(t, "row-0", "g:x", "gx", ts=200, seq=50)
    admin.flush("rt", t, num_regions=2)
    gw = start_rest_gateway(admin)
    yield gw
    gw.stop()
    shutil.rmtree(d, ignore_errors=True)


def test_version_and_root_table_list(gateway):
    code, _, body = _req("GET", f"{gateway.base_url}/version")
    assert code == 200 and body["REST"] == "hbase_spark-rest"
    code, _, body = _req("GET", gateway.base_url + "/")
    assert code == 200
    assert {"name": "rt"} in body["table"]


def test_schema_get_put_and_exists(gateway):
    code, _, body = _req("GET", f"{gateway.base_url}/rt/schema")
    assert code == 200 and body["name"] == "rt"
    assert {c["name"] for c in body["ColumnSchema"]} == {"f", "g"}
    # create a table through the gateway, then drop it
    code, _, _ = _req("PUT", f"{gateway.base_url}/tmp_t/schema",
                      {"ColumnSchema": [{"name": "cf"}]})
    assert code == 201
    code, _, _ = _req("GET", f"{gateway.base_url}/tmp_t/exists")
    assert code == 200
    code, _, _ = _req("DELETE", f"{gateway.base_url}/tmp_t/schema")
    assert code == 200
    code, _, _ = _req("GET", f"{gateway.base_url}/tmp_t/exists")
    assert code == 404


def test_namespaces_roundtrip(gateway):
    code, _, _ = _req("POST", f"{gateway.base_url}/namespaces/nsx")
    assert code == 201
    code, _, body = _req("GET", f"{gateway.base_url}/namespaces")
    assert code == 200 and "nsx" in body["Namespace"]
    code, _, _ = _req("DELETE", f"{gateway.base_url}/namespaces/nsx")
    assert code == 200


def test_regions_lists_ranges_and_location(gateway):
    code, _, body = _req("GET", f"{gateway.base_url}/rt/regions")
    assert code == 200 and body["name"] == "rt"
    # range-partitioned per family: at least the two f-family regions
    assert len(body["Region"]) >= 2
    assert _b64d(body["Region"][0]["startKey"]) == "row-0"


def test_row_get_cellset_shape(gateway):
    code, _, body = _req("GET", f"{gateway.base_url}/rt/row-0")
    assert code == 200
    assert len(body["Row"]) == 1
    rm = body["Row"][0]
    assert _b64d(rm["key"]) == "row-0"
    cols = {_b64d(c["column"]): _b64d(c["$"]) for c in rm["Cell"]}
    assert cols == {"f:q": "v0", "g:x": "gx"}
    # column-scoped
    code, _, body = _req("GET", f"{gateway.base_url}/rt/row-0/f:q")
    cols = {_b64d(c["column"]) for c in body["Row"][0]["Cell"]}
    assert cols == {"f:q"}
    # timestamp-scoped: [ts, ts+1)
    code, _, body = _req("GET", f"{gateway.base_url}/rt/row-0/g:x/200")
    assert body["Row"][0]["Cell"][0]["timestamp"] == 200
    code, _, _ = _req("GET", f"{gateway.base_url}/rt/row-0/g:x/199")
    assert code == 404
    # missing row
    code, _, _ = _req("GET", f"{gateway.base_url}/rt/nope")
    assert code == 404


def test_multiget(gateway):
    code, _, body = _req(
        "GET", f"{gateway.base_url}/rt/multiget?row=row-1&row=row-2"
    )
    assert code == 200
    keys = {_b64d(r["key"]) for r in body["Row"]}
    assert keys == {"row-1", "row-2"}


def test_put_then_get_then_delete_roundtrip(gateway):
    cellset = {"Row": [{
        "key": _b64e("row-new"),
        "Cell": [{"column": _b64e("f:q"), "timestamp": 500,
                  "$": _b64e("posted")}],
    }]}
    code, _, _ = _req("PUT", f"{gateway.base_url}/rt/row-new/f:q", cellset)
    assert code == 200
    code, _, body = _req("GET", f"{gateway.base_url}/rt/row-new")
    assert code == 200
    assert _b64d(body["Row"][0]["Cell"][0]["$"]) == "posted"
    code, _, _ = _req("DELETE", f"{gateway.base_url}/rt/row-new/f:q")
    assert code == 200
    code, _, _ = _req("GET", f"{gateway.base_url}/rt/row-new")
    assert code == 404
    # put-after-delete with server-stamped timestamps must be
    # readable: puts and deletes share the wall-clock domain, so the
    # earlier tombstone cannot mask the later unstamped put
    import time

    time.sleep(0.002)  # ensure the next server stamp exceeds the delete's
    cellset2 = {"Row": [{
        "key": _b64e("row-new"),
        "Cell": [{"column": _b64e("f:q"), "$": _b64e("reborn")}],
    }]}
    code, _, _ = _req("PUT", f"{gateway.base_url}/rt/row-new/f:q", cellset2)
    assert code == 200
    code, _, body = _req("GET", f"{gateway.base_url}/rt/row-new")
    assert code == 200
    assert _b64d(body["Row"][0]["Cell"][0]["$"]) == "reborn"


def test_scanner_lifecycle_with_filter(gateway):
    # ScannerResource: POST -> 201 + Location; GET batches; 204 at end
    code, headers, _ = _req("POST", f"{gateway.base_url}/rt/scanner", {
        "startRow": _b64e("row-2"), "endRow": _b64e("row-6"),
        "batch": 3, "filter": "ValueFilter(!=, 'binary:v3')",
        "column": [_b64e("f:q")],
    })
    assert code == 201
    loc = headers["Location"]
    got = []
    while True:
        code, _, body = _req("GET", loc)
        if code == 204:
            break
        got.extend(
            _b64d(c["$"]) for r in body["Row"] for c in r["Cell"]
        )
    assert got == ["v2", "v4", "v5"]
    code, _, _ = _req("DELETE", loc)
    assert code == 200
    code, _, _ = _req("GET", loc)
    assert code == 404


def test_bad_requests_get_4xx(gateway):
    code, _, _ = _req("GET", f"{gateway.base_url}/rt/multiget")
    assert code == 400
    code, _, _ = _req("GET", f"{gateway.base_url}/rt/scanner/deadbeef")
    assert code == 404
    # malformed CellSet (missing "key") is a 400 BAD REQUEST, not 404
    code, _, _ = _req("PUT", f"{gateway.base_url}/rt/x/f:q",
                      {"Row": [{"Cell": [{"column": _b64e("f:q"),
                                          "$": _b64e("v")}]}]})
    assert code == 400


def test_schema_put_applies_column_attributes(gateway):
    code, _, _ = _req("PUT", f"{gateway.base_url}/attr_t/schema", {
        "ColumnSchema": [{"name": "cf", "VERSIONS": 3, "TTL": 60}],
    })
    assert code == 201
    desc = gateway.admin.describe("attr_t")
    assert desc["families"]["cf"]["max_versions"] == 3
    assert desc["families"]["cf"]["ttl_ms"] == 60_000
    # adding a family must not reset cf's knobs
    code, _, _ = _req("PUT", f"{gateway.base_url}/attr_t/schema", {
        "ColumnSchema": [{"name": "cf"}, {"name": "g", "VERSIONS": 2}],
    })
    assert code == 200
    desc = gateway.admin.describe("attr_t")
    assert desc["families"]["cf"]["max_versions"] == 3
    assert desc["families"]["g"]["max_versions"] == 2
    _req("DELETE", f"{gateway.base_url}/attr_t/schema")


def test_scanner_streams_many_batches_without_collect(gateway, spark):
    """Round-9 verdict task 5 (scale half): a scanner over a table much
    bigger than one batch streams partition-at-a-time through
    toLocalIterator — the driver never materializes the scan with a
    full collect().  The spy patches DataFrame.collect for the PULL
    phase only; a full-collect scanner implementation would trip it."""
    from pyspark.sql import DataFrame

    from hbase_spark.table import Table

    t = gateway.admin
    t.create_table("big_scan", ["f"])
    tb = t.table("big_scan")
    tb = tb.put(
        [(f"k{i:04d}", "f", "q", f"v{i}") for i in range(300)],
        ts=100, seq=1,
    )
    t.flush("big_scan", tb, num_regions=4)
    code, headers, _ = _req(
        "POST", f"{gateway.base_url}/big_scan/scanner",
        {"batch": 20},
    )
    assert code == 201
    loc = headers["Location"]

    pulls = {"collects": 0}
    orig_collect = DataFrame.collect

    def spy(self_df):
        pulls["collects"] += 1
        return orig_collect(self_df)

    DataFrame.collect = spy
    try:
        rows, batches = 0, 0
        while True:
            code, _, body = _req("GET", loc)
            if code == 204:
                break
            assert code == 200
            batches += 1
            got = sum(len(rm["Cell"]) for rm in body["Row"])
            assert got <= 20  # bounded per-pull transfer
            rows += got
    finally:
        DataFrame.collect = orig_collect
    assert rows == 300
    assert batches == 15
    assert pulls["collects"] == 0  # toLocalIterator only, no collect
    _req("DELETE", loc)
    t.disable_table("big_scan")
    t.delete_table("big_scan")


def test_scanner_lease_expiry_and_slow_client_survival(gateway):
    """Round-9 verdict task 5 (lease half): an expired-lease scanner
    404s on ACCESS (not only when a new openScanner sweeps), while a
    slow client that keeps pulling inside the lease window survives
    past the lease duration because every pull refreshes the lease."""
    import time

    # margins sized for a loaded box (the sharded runner packs 4 Spark
    # JVMs): the live client's idle gap (0.5s) stays far under the
    # lease (2s) even with ~1s of scheduling noise, and the dead
    # scanner's silence (2.6s) stays far over it
    old_lease = gateway.scanner_lease_sec
    gateway.scanner_lease_sec = 2.0
    try:
        # expired: no touch for > lease -> 404
        code, headers, _ = _req(
            "POST", f"{gateway.base_url}/rt/scanner", {"batch": 2}
        )
        assert code == 201
        dead = headers["Location"]
        time.sleep(2.6)
        code, _, _ = _req("GET", dead)
        assert code == 404
        # slow-but-alive: pulls at 0.5s < lease, total walltime > lease
        code, headers, _ = _req(
            "POST", f"{gateway.base_url}/rt/scanner", {"batch": 2}
        )
        assert code == 201
        live = headers["Location"]
        for _ in range(5):
            time.sleep(0.5)
            code, _, _ = _req("GET", live)
            assert code in (200, 204)
        _req("DELETE", live)
    finally:
        gateway.scanner_lease_sec = old_lease
