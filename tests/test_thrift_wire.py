"""Wire-level tests for the hand-rolled TBinaryProtocol transport
(hbase_spark/thrift_wire.py) against a stub handler — no Spark, pure
sockets, so the protocol laws (framing, strict header, unknown-field
skip, declared vs undeclared exceptions) are pinned in milliseconds."""

import io

import pytest

from hbase_spark.thrift2 import TColumnValue, TGet, TPut, TResult
from hbase_spark.thrift_wire import (
    I32,
    I64,
    LIST,
    MSG_CALL,
    STOP,
    STRING,
    STRUCT,
    TGET,
    TApplicationException,
    TIllegalArgument,
    TIOError,
    ThriftClient,
    ThriftServer,
    _Reader,
    _Writer,
)


class StubHandler:
    """Echo-shaped THBaseService stub: enough surface to exercise every
    wire path without a SparkSession."""

    def __init__(self):
        self.puts = []

    def get(self, table, tget):
        if table == "boom":
            raise RuntimeError("disk on fire")
        return TResult(row=tget.row, columnValues=[
            TColumnValue("f", "q", f"val-of-{tget.row}", timestamp=7),
        ])

    def put(self, table, tput):
        self.puts.append((table, tput))

    def exists(self, table, tget):
        return tget.row == "yes"

    def existsAll(self, table, tgets):
        return [g.row == "yes" for g in tgets]

    def getScannerRows(self, scanner_id, num_rows=1):
        raise ValueError(f"invalid scanner id {scanner_id}")

    def checkAndPut(self, table, row, family, qualifier, value, tput):
        # absence guard: wire must deliver value=None when field 5 absent
        return value is None


@pytest.fixture(scope="module", params=[
    ("binary", True), ("binary", False),
    ("compact", True), ("compact", False),
], ids=["binary-framed", "binary-buffered",
        "compact-framed", "compact-buffered"])
def wire(request):
    proto, framed = request.param
    h = StubHandler()
    server = ThriftServer(h, port=0, framed=framed,
                          protocol=proto).start()
    client = ThriftClient(server.host, server.port, framed=framed,
                          protocol=proto)
    yield h, client
    client.close()
    server.stop()


def test_roundtrip_get_and_void_put(wire):
    h, client = wire
    res = client.get("t1", TGet(row="r9"))
    assert res.row == "r9"
    assert res.columnValues[0].value == "val-of-r9"
    assert res.columnValues[0].timestamp == 7
    assert client.put("t1", TPut(row="p", columnValues=[
        TColumnValue("f", "q", "v"),
    ])) is None
    assert h.puts[-1][0] == "t1"
    assert h.puts[-1][1].columnValues[0].value == "v"


def test_bool_and_list_results(wire):
    _, client = wire
    assert client.exists("t", TGet(row="yes")) is True
    assert client.exists("t", TGet(row="no")) is False
    assert client.existsAll("t", [TGet(row="yes"), TGet(row="no")]) == [
        True, False,
    ]


def test_declared_exceptions_cross_the_wire(wire):
    _, client = wire
    # undeclared RuntimeError -> TIOError at result field 1
    with pytest.raises(TIOError, match="disk on fire"):
        client.get("boom", TGet(row="x"))
    # ValueError -> TIllegalArgument at field 2 (scanner methods);
    # TIllegalArgument subclasses ValueError for in-process parity
    with pytest.raises(TIllegalArgument, match="invalid scanner id 42"):
        client.getScannerRows(42, 1)
    assert issubclass(TIllegalArgument, ValueError)
    # the connection survives both error replies
    assert client.exists("t", TGet(row="yes")) is True


def test_unknown_method_is_application_exception(wire):
    _, client = wire
    with pytest.raises(TApplicationException, match="unknown method"):
        client_call_unknown(client)
    assert client.exists("t", TGet(row="yes")) is True


def client_call_unknown(client):
    """Hand-encode a CALL for a method the server doesn't know."""
    from hbase_spark.thrift_wire import _read_message, _write_message

    w = client._writer_cls()
    client._seqid += 1
    w.message_begin("mutateRowsAtomically", MSG_CALL, client._seqid)
    w.stop()  # empty args struct
    _write_message(client._f, bytes(w.buf), client._framed)
    r = _read_message(client._f, client._framed, client._reader_cls)
    name, mtype, _ = r.message_begin()
    assert mtype == 3  # EXCEPTION
    # decode TApplicationException {1: message, 2: type}
    msg = None
    while True:
        ttype, fid = r.field_begin()
        if ttype == STOP:
            break
        if fid == 1 and ttype == STRING:
            msg = r.string()
        else:
            r.skip(ttype)
    raise TApplicationException(msg)


def test_absence_guard_value_none_rides_as_missing_field(wire):
    _, client = wire
    assert client.checkAndPut(
        "t", "r", "f", "q", None, TPut(row="r")
    ) is True
    assert client.checkAndPut(
        "t", "r", "f", "q", "present", TPut(row="r")
    ) is False


def test_unknown_struct_fields_are_skipped():
    """Forward compat: a TGet encoded with extra fields a newer IDL
    added (attributes map at 7, authorizations struct at 8, an i64 at
    99) decodes to the fields this engine models, rest skipped."""
    from hbase_spark.thrift_wire import MAP

    w = _Writer()
    w.field(STRING, 1)
    w.binary("row-1")
    w.field(MAP, 7)  # attributes: map<binary,binary>
    w.map_begin(STRING, STRING, 1)
    w.binary("k")
    w.binary("v")
    w.field(STRUCT, 8)  # authorizations struct
    w.field(LIST, 1)
    w.list_begin(STRING, 2)
    w.binary("sec")
    w.binary("public-ref")
    w.stop()
    w.field(I64, 99)
    w.i64(123456789)
    w.field(I32, 5)  # maxVersions — modeled, AFTER unknown fields
    w.i32(3)
    w.stop()
    g = TGET.decode(_Reader(io.BytesIO(bytes(w.buf))))
    assert g.row == "row-1"
    assert g.maxVersions == 3
    assert g.columns is None


def test_strict_header_is_required():
    w = _Writer()
    w.i32(11)  # old-style header: positive length-prefixed name
    r = _Reader(io.BytesIO(bytes(w.buf) + b"x" * 32))
    with pytest.raises(TApplicationException, match="old-style"):
        r.message_begin()


def test_malformed_stream_closes_connection_server_survives(wire):
    """Garbage bytes make the stream position unrecoverable: the server
    closes that connection (client sees EOF), but keeps serving new
    connections."""
    import socket as socket_mod

    h, client = wire
    bad = socket_mod.create_connection(
        (client._sock.getpeername()[0], client._sock.getpeername()[1]),
        timeout=5,
    )
    try:
        bad.sendall(b"\x00\x00\x00\x04GARB")  # framed: 4-byte frame "GARB"
        bad.settimeout(5)
        assert bad.recv(1) == b""  # server closed the connection
    finally:
        bad.close()
    # the original client connection still works
    assert client.exists("t", TGet(row="yes")) is True


# -- codec round-trip law -----------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from hbase_spark.thrift2 import (  # noqa: E402
    TColumn,
    TDelete,
    TScan,
    TTimeRange,
)
from hbase_spark.thrift_wire import TDELETE, TRESULT, TSCAN  # noqa: E402

_txt = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=40,
)
_ts = st.one_of(st.none(), st.integers(min_value=0, max_value=2**62))
_col = st.builds(
    TColumn, family=_txt, qualifier=st.one_of(st.none(), _txt),
    timestamp=_ts,
)
_scan = st.builds(
    TScan,
    startRow=st.one_of(st.none(), _txt),
    stopRow=st.one_of(st.none(), _txt),
    columns=st.one_of(st.none(), st.lists(_col, max_size=3)),
    caching=st.one_of(st.none(), st.integers(1, 10_000)),
    maxVersions=st.integers(1, 100),
    timeRange=st.one_of(st.none(), st.builds(
        TTimeRange, minStamp=st.integers(0, 2**40),
        maxStamp=st.integers(0, 2**40),
    )),
    filterString=st.one_of(st.none(), _txt),
    reversed=st.booleans(),
    limit=st.one_of(st.none(), st.integers(1, 10**6)),
)
_delete = st.builds(
    TDelete, row=_txt,
    columns=st.one_of(st.none(), st.lists(_col, min_size=1, max_size=3)),
    timestamp=_ts, deleteType=st.integers(0, 3),
)
_result = st.builds(
    TResult, row=st.one_of(st.none(), _txt),
    columnValues=st.lists(st.builds(
        TColumnValue, family=_txt, qualifier=_txt, value=_txt,
        timestamp=_ts,
    ), max_size=4),
    stale=st.booleans(), partial=st.booleans(),
)


@settings(max_examples=120, deadline=None)
@given(obj=st.one_of(_scan, _delete, _result))
def test_struct_codecs_round_trip(obj):
    """encode(decode(x)) == x for random TScan/TDelete/TResult incl.
    unicode strings, None optionals, and nested struct lists — the
    codec law every method's args and results reduce to, under BOTH
    wire protocols (binary's fixed-width ints and compact's
    zigzag-varint + field-id-delta encoding)."""
    from hbase_spark.thrift_wire import PROTOCOLS

    spec = {TScan: TSCAN, TDelete: TDELETE, TResult: TRESULT}[type(obj)]
    for writer_cls, reader_cls in PROTOCOLS.values():
        w = writer_cls()
        spec.encode(w, obj)
        back = spec.decode(reader_cls(io.BytesIO(bytes(w.buf))))
        assert back == obj


def test_method_table_and_arg_names_agree():
    """METHODS and ARG_NAMES must not drift: same method set, and each
    name list exactly as long as its argspec."""
    from hbase_spark.thrift_wire import ARG_NAMES, METHODS

    assert set(METHODS) == set(ARG_NAMES)
    for name, (argspec, _, throws) in METHODS.items():
        assert len(ARG_NAMES[name]) == len(argspec), name
        assert 1 in throws, name  # every method declares TIOError
        fids = [fid for fid, _, _ in argspec]
        assert fids == sorted(fids) and len(set(fids)) == len(fids), name
