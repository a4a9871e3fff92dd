"""REST gateway (hbase-rest analog, the Stargate protocol).

Reference: ``hbase-rest/src/main/java/org/apache/hadoop/hbase/rest/``
— RootResource (table list), VersionResource, NamespacesResource,
SchemaResource, RegionsResource (TableInfoModel), ExistsResource,
RowResource + RowSpec (cell CRUD), MultiRowResource (multiget),
ScannerResource + ScannerInstanceResource (stateful scanners with a
Location header), and the JSON wire model in ``rest/model/`` —
CellModel ``{"column": b64, "timestamp": ms, "$": b64}``, RowModel
``{"key": b64, "Cell": [...]}``, CellSetModel ``{"Row": [...]}``.

This gateway serves the JSON representation of that protocol over the
engine's Admin/Table API (the reference also speaks XML and protobuf;
JSON is the representation implemented here — the model shapes and
routes match so a JSON REST client ports unchanged).  Byte values are
base64 on the wire exactly like the reference; the engine's CellFrame
is utf-8 typed, so the mapping decodes to utf-8 strings.

Execution notes for the Spark mapping:

* **Reads** run the same scan/get plans as the native API — row-key
  range pruning, family projection, ParseFilter strings (the scanner
  body's ``filter`` accepts the shell/ParseFilter language, which IS
  the reference REST gateway's filter language surface).
* **Writes** are row-at-a-time RPCs by protocol; each mutation applies
  and flushes, so durability matches the reference's autoflush client.
  Mutations SERIALIZE per table (a write lock guards each
  read-mutate-flush span — the fix for a lost-update bug found in
  round-9 review), so gateway write throughput is bounded by design.
  Corpus-scale writers must use the batch path (``Table.put`` over
  whole DataFrames, bulk load via ``sources/layout.py``), not a REST
  loop — same advice as the reference gives.
* **Scanners** are server-held iterators over ``toLocalIterator()`` —
  partition-at-a-time pull, never a whole-table collect, so a scanner
  over a 100 TB table streams at the client's pace with one partition
  buffered.
"""

from __future__ import annotations

import base64
import json
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

VERSION = {"REST": "hbase_spark-rest", "JVM": "n/a (PySpark)",
           "Server": "http.server", "Jersey": "n/a"}


def _b64e(s: str) -> str:
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def _b64d(s: str) -> str:
    return base64.b64decode(s).decode("utf-8")


class _Scanner:
    """ScannerInstanceResource state: a batch-pulling iterator over the
    scan's local iterator (partition-at-a-time, never a full collect).
    Pulls serialize on a mutex — two concurrent GETs on one scanner id
    share the iterator state."""

    def __init__(self, df, batch: int):
        self.rows = df.toLocalIterator()
        self.batch = max(1, batch)
        self.exhausted = False
        self._mutex = threading.Lock()

    def next_cells(self) -> list:
        out = []
        with self._mutex:
            for _ in range(self.batch):
                try:
                    out.append(next(self.rows))
                except StopIteration:
                    self.exhausted = True
                    break
        return out


class RestGateway:
    """Serve the Stargate JSON protocol for one Admin catalog."""

    def __init__(self, admin, host: str = "127.0.0.1", port: int = 0):
        self.admin = admin
        self._scanners: dict[str, tuple] = {}  # sid -> (scanner, seen)
        self.scanner_lease_sec = 300.0  # ScannerResource lease analog
        self._seq = 0
        self._lock = threading.Lock()
        # per-table write locks: a mutation is read-mutate-flush, and
        # two concurrent writers to one table would lose the first
        # writer's cells (both start from the same base frame)
        self._write_locks: dict[str, threading.Lock] = {}
        gw = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet test output
                pass

            def _reply(self, code: int, obj=None, headers=None):
                self.send_response(code)
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                if obj is not None:
                    body = json.dumps(obj).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_header("Content-Length", "0")
                    self.end_headers()

            def _body(self):
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b""
                return json.loads(raw) if raw else {}

            def _route(self, method):
                url = urlparse(self.path)
                parts = [unquote(p) for p in url.path.split("/") if p]
                try:
                    gw._dispatch(self, method, parts, parse_qs(url.query))
                except KeyError as e:
                    self._reply(404, {"error": str(e)})
                except ValueError as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — gateway boundary
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            def do_GET(self):
                self._route("GET")

            def do_PUT(self):
                self._route("PUT")

            def do_POST(self):
                self._route("POST")

            def do_DELETE(self):
                self._route("DELETE")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "RestGateway":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def base_url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    # -- helpers ----------------------------------------------------------

    def _next_seq(self) -> int:
        with self._lock:
            self._seq += 1
            return self._seq

    def _now_ms(self) -> int:
        """Server timestamp for cells the client left unstamped — the
        reference stamps HConstants.LATEST_TIMESTAMP server-side with
        wall-clock ms.  Puts and deletes MUST share this clock: a
        delete stamped in a different domain than later puts would
        mask them forever."""
        import time

        return int(time.time() * 1000)

    def _table(self, name: str):
        return self.admin.table(name)

    def _write_lock(self, name: str) -> threading.Lock:
        with self._lock:
            return self._write_locks.setdefault(name, threading.Lock())

    @staticmethod
    def _cellset(rows) -> dict:
        """CellSetModel JSON from collected cell rows (grouped by row
        key, reference RowModel order)."""
        by_row: dict[str, list] = {}
        for r in rows:
            by_row.setdefault(r["row"], []).append(r)
        return {"Row": [
            {"key": _b64e(k), "Cell": [
                {"column": _b64e(f"{c['family']}:{c['qualifier']}"),
                 "timestamp": int(c["ts"]),
                 "$": _b64e("" if c["value"] is None else str(c["value"]))}
                for c in cells
            ]}
            for k, cells in sorted(by_row.items())
        ]}

    @staticmethod
    def _family_descriptor(col: dict):
        """ColumnSchemaModel attributes -> FamilyDescriptor (the
        reference applies the submitted VERSIONS/TTL/... — a bare
        default would silently drop the client's schema knobs).
        TTL arrives in seconds like the HBase attribute."""
        from hbase_spark.table import FamilyDescriptor

        kw = {}
        if "VERSIONS" in col:
            kw["max_versions"] = int(col["VERSIONS"])
        if "MIN_VERSIONS" in col:
            kw["min_versions"] = int(col["MIN_VERSIONS"])
        if "TTL" in col:
            kw["ttl_ms"] = int(col["TTL"]) * 1000
        if "KEEP_DELETED_CELLS" in col:
            kw["keep_deleted_cells"] = str(
                col["KEEP_DELETED_CELLS"]
            ).upper() in ("TRUE", "1")
        if "NEW_VERSION_BEHAVIOR" in col:
            kw["new_version_behavior"] = str(
                col["NEW_VERSION_BEHAVIOR"]
            ).upper() in ("TRUE", "1")
        if "MOB_THRESHOLD" in col:
            kw["mob_threshold"] = int(col["MOB_THRESHOLD"])
        return FamilyDescriptor(**kw)

    @staticmethod
    def _split_col(col: str) -> tuple[str, str | None]:
        if ":" in col:
            f, q = col.split(":", 1)
            return f, q
        return col, None

    # -- dispatch ----------------------------------------------------------

    def _dispatch(self, h, method: str, parts: list[str], query: dict):
        admin = self.admin
        if not parts:
            if method == "GET":  # RootResource: table list
                return h._reply(200, {"table": [
                    {"name": t} for t in admin.list_tables()
                ]})
            raise ValueError("unsupported method on /")

        head = parts[0]
        if head == "version":
            return h._reply(200, VERSION)
        if head == "namespaces":
            return self._namespaces(h, method, parts[1:])
        # everything else is table-scoped
        name, rest = head, parts[1:]
        if not rest:
            raise ValueError("missing resource under table")
        if rest[0] == "schema":
            return self._schema(h, method, name)
        if rest[0] == "regions":
            return self._regions(h, name)
        if rest[0] == "exists":
            return (h._reply(200, {}) if admin.table_exists(name)
                    else h._reply(404))
        if rest[0] == "multiget":
            return self._multiget(h, name, query)
        if rest[0] == "scanner":
            return self._scanner(h, method, name, rest[1:])
        return self._row(h, method, name, rest, query)

    # -- resources ----------------------------------------------------------

    def _namespaces(self, h, method: str, rest: list[str]):
        admin = self.admin
        if not rest:
            return h._reply(200, {
                "Namespace": admin.list_namespaces()
            })
        ns = rest[0]
        if method == "GET":
            return h._reply(200, admin.describe_namespace(ns))
        if method == "POST" or method == "PUT":
            admin.create_namespace(ns)
            return h._reply(201)
        if method == "DELETE":
            admin.drop_namespace(ns)
            return h._reply(200)
        raise ValueError(f"unsupported {method} on namespace")

    def _schema(self, h, method: str, name: str):
        admin = self.admin
        if method == "GET":  # TableSchemaModel
            desc = admin.describe(name)
            return h._reply(200, {
                "name": name,
                "ColumnSchema": [
                    {"name": f, **{k: v for k, v in knobs.items()
                                   if v is not None}}
                    for f, knobs in desc["families"].items()
                ],
            })
        if method in ("PUT", "POST"):  # create / update
            body = h._body()
            cols = body.get("ColumnSchema", [])
            if not cols:
                raise ValueError("ColumnSchema required")
            fams = {c["name"]: self._family_descriptor(c) for c in cols}
            if admin.table_exists(name):
                # Stargate clients PUT the full schema to add a family:
                # only families the table lacks are added, WITH their
                # submitted attributes — existing descriptors keep
                # their knobs (a default-constructed alter would
                # silently reset VERSIONS/TTL)
                existing = set(admin.describe(name)["families"])
                for f, fd in fams.items():
                    if f not in existing:
                        admin.alter(name, f, fd)
                return h._reply(200)
            admin.create_table(name, fams)
            return h._reply(201)
        if method == "DELETE":
            admin.disable_table(name)
            admin.delete_table(name)
            return h._reply(200)
        raise ValueError(f"unsupported {method} on schema")

    def _regions(self, h, name: str):
        # TableInfoModel (RegionsResource): region name/range rows
        rows = self.admin._cached_region_inventory(name)
        return h._reply(200, {"name": name, "Region": [
            {"name": r["region_file"].rsplit("/", 1)[-1],
             "startKey": _b64e(str(r["start_key"])),
             "endKey": _b64e(str(r["end_key"])),
             "location": self.admin.server_of_region(
                 name, r["region_file"].rsplit("/", 1)[-1]) or ""}
            for r in rows
        ]})

    def _multiget(self, h, name: str, query: dict):
        rows = query.get("row", [])
        if not rows:
            raise ValueError("multiget needs row= params")
        table = self._table(name)
        cells = table.multi_get(rows).collect()
        if not cells:
            return h._reply(404)
        return h._reply(200, self._cellset([r.asDict() for r in cells]))

    def _row(self, h, method: str, name: str, rest: list[str], query: dict):
        """RowResource/RowSpec: /{table}/{row}[/{col}[/{ts}]]."""
        from hbase_spark.shell import shell_get

        row = rest[0]
        col = rest[1] if len(rest) > 1 else None
        ts = int(rest[2]) if len(rest) > 2 else None
        table = self._table(name)
        if method == "GET":
            kw = {}
            if col:
                kw["COLUMNS"] = [col]
            if "v" in query:
                kw["VERSIONS"] = int(query["v"][0])
            if ts is not None:
                # RowSpec: a single path timestamp means [ts, ts+1)
                kw["TIMERANGE"] = (ts, ts + 1)
            cells = shell_get(table, row, **kw).collect()
            if not cells:
                return h._reply(404)
            return h._reply(200, self._cellset([r.asDict() for r in cells]))
        if method in ("PUT", "POST"):
            body = h._body()
            seq = self._next_seq()
            default_ts = ts if ts is not None else self._now_ms()
            puts = []
            try:
                for rm in body.get("Row", []):
                    rkey = _b64d(rm["key"])
                    for cm in rm.get("Cell", []):
                        fam, qual = self._split_col(_b64d(cm["column"]))
                        cts = int(cm.get("timestamp", default_ts))
                        puts.append(
                            (rkey, fam, qual, _b64d(cm["$"]), cts)
                        )
            except KeyError as e:
                # missing key/column/$ is a BAD REQUEST, not a 404
                raise ValueError(f"malformed CellSet body: {e}") from e
            if not puts:
                raise ValueError("empty CellSet body")
            with self._write_lock(name):
                out = self._table(name)
                for rkey, fam, qual, val, cts in puts:
                    out = out.put([(rkey, fam, qual, val)], ts=cts, seq=seq)
                self.admin.flush(name, out)
            return h._reply(200)
        if method == "DELETE":
            from hbase_spark.shell import shell_delete, shell_deleteall

            seq = self._next_seq()
            dts = ts if ts is not None else self._now_ms()
            with self._write_lock(name):
                base = self._table(name)
                if col:
                    out = shell_delete(base, row, col, ts=dts, seq=seq)
                else:
                    out = shell_deleteall(base, row, ts=dts, seq=seq)
                self.admin.flush(name, out)
            return h._reply(200)
        raise ValueError(f"unsupported {method} on row")

    def _scanner(self, h, method: str, name: str, rest: list[str]):
        from hbase_spark.shell import shell_scan

        if method in ("PUT", "POST") and not rest:
            body = h._body()
            kw = {}
            if body.get("startRow"):
                kw["STARTROW"] = _b64d(body["startRow"])
            if body.get("endRow"):
                kw["STOPROW"] = _b64d(body["endRow"])
            if body.get("column"):
                kw["COLUMNS"] = [_b64d(c) for c in body["column"]]
            if body.get("filter"):
                # the ParseFilter string language — the same filter
                # surface the reference gateway exposes
                kw["FILTER"] = body["filter"]
            if body.get("maxVersions"):
                kw["VERSIONS"] = int(body["maxVersions"])
            if body.get("startTime") or body.get("endTime"):
                kw["TIMERANGE"] = (
                    int(body.get("startTime", 0)),
                    int(body.get("endTime", 2**62)),
                )
            df = shell_scan(self._table(name), **kw).orderBy(
                "row", "family", "qualifier"
            )
            sid = uuid.uuid4().hex[:16]
            import time

            # build the scanner OUTSIDE the lock and BEFORE stamping its
            # lease: toLocalIterator setup costs a Spark round-trip, and
            # stamping first would hand the client a lease that is
            # already ~1s old at reply time
            scanner = _Scanner(df, int(body.get("batch", 100)))
            with self._lock:
                # lease expiry (ScannerResource's scanner lease):
                # abandoned scanners must not pin iterators forever
                now = time.time()
                for k in [
                    k for k, (_, seen) in self._scanners.items()
                    if now - seen > self.scanner_lease_sec
                ]:
                    del self._scanners[k]
                self._scanners[sid] = (scanner, now)
            return h._reply(201, {}, headers={
                "Location": f"{self.base_url}/{name}/scanner/{sid}"
            })
        if not rest:
            raise ValueError("scanner id required")
        sid = rest[0]
        import time

        import math

        with self._lock:
            entry = self._scanners.get(sid)
            now = time.time()
            if entry is not None and now - entry[1] > self.scanner_lease_sec:
                # lease enforcement on ACCESS, not just at open time:
                # the reference's ScannerResource 404s an expired id
                # even if no new scanner ever triggered a sweep
                del self._scanners[sid]
                entry = None
            if entry is not None and method == "GET":
                # in-use marker: an inf stamp keeps concurrent sweeps
                # from reaping this scanner while its Spark pull runs
                self._scanners[sid] = (entry[0], math.inf)
        if entry is None:
            raise KeyError(f"no scanner {sid}")
        sc = entry[0]
        if method == "GET":
            try:
                cells = sc.next_cells()
            finally:
                # renew AFTER the pull — the reference renews when the
                # RPC completes, so server-side scan time (a Spark job
                # here) never counts against the client's idle window;
                # in a finally so a failed pull cannot leave the inf
                # stamp behind, and guarded so a DELETE issued
                # mid-pull stays closed
                with self._lock:
                    if sid in self._scanners:
                        self._scanners[sid] = (sc, time.time())
            if not cells:
                return h._reply(204)  # exhausted, like the reference
            return h._reply(200, self._cellset([r.asDict() for r in cells]))
        if method == "DELETE":
            with self._lock:
                self._scanners.pop(sid, None)
            return h._reply(200)
        raise ValueError(f"unsupported {method} on scanner instance")


_PORT_RE = re.compile(r":(\d+)$")


def start_rest_gateway(admin, port: int = 0) -> RestGateway:
    """RESTServer.main analog: start the gateway for a catalog on
    ``port`` (0 = ephemeral) and return the running server."""
    return RestGateway(admin, port=port).start()
