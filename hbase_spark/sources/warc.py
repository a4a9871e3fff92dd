"""WARC (Web ARChive, ISO 28500) ingestion source.

The standard container for web-crawl corpora (Common Crawl publishes
WARC / WET files): a training-data pipeline's documents table usually
STARTS as WARC records, so this source closes the loop from crawl
archive to the `documents`-shaped frame every curation operator in
functions/text.py and functions/dedup.py consumes.

Scale shape: real WARC files are per-file gzip-member streams and are
processed one-file-per-task in every production stack (they are not
block-splittable); `read_warc` mirrors that — `binaryFile` gives one
row per archive, and an Arrow-batched mapInPandas splits records
inside the task, so a directory of N archives parallelizes N-wide
with zero shuffle.  Record payloads never leave the task that parsed
them until the caller's first wide operator.

Corrupt-payload policy (the media-codec contract): a file that does
not start with a WARC version line, a record whose Content-Length
runs past the file, or a header block without Content-Length raises
ValueError — ingestion seams never guess.

Reference parity: ingestion formats map to SURVEY §2.1's input-format
family (TableInputFormat / ImportTsv analogs); WARC is the
training-pipeline member of that family.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def encode_warc(records: list[dict], *, compress: bool = False) -> bytes:
    """Fixture encoder (the lossless-fixture discipline of the media
    codecs): mux record dicts — keys ``warc_type``, ``target_uri``,
    ``record_id``, ``warc_date``, ``content_type``, ``content``
    (bytes) — into a spec-shaped WARC byte stream, optionally as
    per-record gzip members (the Common Crawl layout)."""
    out = []
    for r in records:
        body = r.get("content", b"")
        headers = [b"WARC/1.0"]
        for key, field in [
            (b"WARC-Type", "warc_type"),
            (b"WARC-Record-ID", "record_id"),
            (b"WARC-Target-URI", "target_uri"),
            (b"WARC-Date", "warc_date"),
            (b"Content-Type", "content_type"),
        ]:
            if r.get(field) is not None:
                headers.append(key + b": " + str(r[field]).encode())
        headers.append(b"Content-Length: " + str(len(body)).encode())
        rec = b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"
        out.append(gzip.compress(rec) if compress else rec)
    return b"".join(out)


def parse_warc(data: bytes, *, warc_file: str = "") -> list[tuple]:
    """Split one WARC byte stream (plain or concatenated-gzip-member)
    into WARC_SCHEMA rows.  Pure function so it is testable without
    Spark and reusable by the mapInPandas seam."""
    if data[:2] == b"\x1f\x8b":  # concatenated gzip members
        data = gzip.decompress(data)
    if not data.lstrip(b"\r\n").startswith(b"WARC/"):
        raise ValueError("not a WARC payload: no WARC/ version line")
    rows = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n:
            if data[pos:pos + 2] == b"\r\n":
                pos += 2
            elif data[pos:pos + 1] == b"\n":
                pos += 1
            else:
                break
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if head_end == -1:
            head_end = data.find(b"\n\n", pos)
            sep = 2
        if head_end == -1:
            raise ValueError("truncated WARC header block")
        header_lines = data[pos:head_end].decode("utf-8", "replace")
        if not header_lines.startswith("WARC/"):
            raise ValueError("record does not start with a WARC/ line")
        fields = {}
        for line in header_lines.splitlines()[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError("WARC record without Content-Length")
        length = int(fields["content-length"])
        body_start = head_end + sep
        if body_start + length > n:
            raise ValueError("WARC Content-Length runs past the file")
        body = data[body_start:body_start + length]
        rows.append(
            (
                warc_file,
                fields.get("warc-record-id"),
                fields.get("warc-type"),
                fields.get("warc-target-uri"),
                fields.get("warc-date"),
                fields.get("content-type"),
                body,
            )
        )
        pos = body_start + length
    return rows


def _split_archives(batches):
    import pandas as pd

    cols = [f.name for f in WARC_SCHEMA.fields]
    for pdf in batches:
        rows = []
        for fname, content in zip(pdf["path"], pdf["content"]):
            rows.extend(parse_warc(bytes(content), warc_file=fname))
        yield pd.DataFrame(rows, columns=cols)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC record across every archive under ``path``.

    `binaryFile` yields one task per archive — the parallelism model
    every WARC consumer uses, because gzip-member archives are not
    block-splittable — and record splitting happens task-side in an
    Arrow-batched mapInPandas; nothing shuffles."""
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _split_archives, WARC_SCHEMA
    )


def stream_warc(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming twin of ``read_warc`` for a continuously-fed crawl
    drop directory: the `binaryFile` file stream discovers new
    archives (checkpointed offsets = exactly-once per archive), and
    the same task-side split turns each into records.  Feed it to
    `foreachBatch` with ``warc_documents`` + the curation operators
    for an ingest-as-it-lands pipeline."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, "
        "content binary"  # the binaryFile source's fixed schema —
    )                     # streaming sources require it spelled out
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(
        _split_archives, WARC_SCHEMA
    )


def warc_documents(
    warc: DataFrame, *, min_chars: int = 1, with_date: bool = False
) -> DataFrame:
    """Project crawl records to the `documents` shape the curation
    operators consume: response/conversion records with a text
    payload become (doc_id, text, source, n_chars) — doc_id a
    deterministic hash of (record_id, uri) so re-ingesting an archive
    is idempotent.  ``with_date=True`` adds ``warc_ts`` (the WARC-Date
    header as epoch millis) — the event time the streaming ingest
    pipeline's watermark needs."""
    from pyspark.sql import functions as F

    text = F.col("content").cast("string")
    cols = [
        F.xxhash64("record_id", "target_uri").alias("doc_id"),
        text.alias("text"),
        F.col("target_uri").alias("source"),
        F.length(text).alias("n_chars"),
    ]
    if with_date:
        # try_to_timestamp, not to_timestamp: under Spark 4's ANSI
        # default a present-but-unparseable WARC-Date would throw and
        # kill the stream; NULL instead flows to the ingest pipeline's
        # arrival-time fallback.  WARC 1.0 dates are second-precision;
        # WARC 1.1 allows fractional seconds (up to nanos) — cover
        # both, plus a trailing-junk-tolerant final form.  The 'X'
        # pattern letter parses the trailing Z as a UTC OFFSET (an
        # instant), not a literal — a 'Z'-literal pattern would parse
        # the UTC wall time in the session timezone and shift warc_ts
        # by the zone offset under any non-UTC session (the same
        # session-tz bug class as the streaming state timeout); the
        # offset-less fallback re-appends Z for the same reason.
        parsed = F.coalesce(
            F.try_to_timestamp(
                F.col("warc_date"), F.lit("yyyy-MM-dd'T'HH:mm:ssX")
            ),
            F.try_to_timestamp(
                F.col("warc_date"),
                F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSX"),
            ),
            F.try_to_timestamp(
                F.concat(
                    F.regexp_extract(
                        F.col("warc_date"),
                        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})",
                        1,
                    ),
                    F.lit("Z"),
                ),
                F.lit("yyyy-MM-dd'T'HH:mm:ssX"),
            ),
        )
        cols.append(F.unix_millis(parsed).alias("warc_ts"))
    return (
        warc.filter(F.col("warc_type").isin("response", "conversion"))
        .select(*cols)
        .filter(F.col("n_chars") >= min_chars)
    )
