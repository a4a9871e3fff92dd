"""WebDataset tar-shard sink + source.

WebDataset — tar shards whose member names group into samples by key
(``000123.jpg`` + ``000123.txt`` + ``000123.json`` = one sample) — is
the de-facto packaging for multimodal training corpora, consumed
sequentially by dataloaders.  This closes the pipeline's OUTPUT side
the way sources/warc.py closes the input side: curated documents /
media leave the engine as shards a trainer streams directly.

Scale shape (the WARC discipline, mirrored): tar shards are not
block-splittable, so parallelism is the shard count on both sides —
`write_webdataset` routes samples to shards by key hash (each shard
is written by exactly one task; one shuffle on the 4-byte shard id,
payload bytes move once), `read_webdataset` is `binaryFile` + a
task-side tar split.  Shard content is sorted by key and written with
zeroed tar metadata, so output bytes are a pure function of the data
— re-running the sink is idempotent, byte-for-byte.

Corrupt-payload policy: a read payload that is not a tar archive, or
a member without the ``key.ext`` naming, raises ValueError.
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("ext", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("n_files", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)


def write_webdataset(
    df: DataFrame,
    path: str,
    *,
    key_col: str = "key",
    files_col: str = "files",
    shards: int = 8,
) -> DataFrame:
    """Write (key, files: map<string,binary>) rows as WebDataset tar
    shards under ``path``; returns the shard manifest (and writes it
    as ``_manifest.json`` rows alongside — underscore-prefixed so
    Hadoop readers ignore it).

    Sample-to-shard routing is ``xxhash64(key) % shards`` — stable
    across runs and appends, like the layout's pre-split convention;
    a shard must fit one task's memory, so size ``shards`` to the
    corpus (they are the read-side parallelism too).
    """
    import json

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    width = max(len(str(shards - 1)), 5)
    d = (
        df.select(
            F.col(key_col).cast("string").alias("_key"),
            F.col(files_col).alias("_files"),
            F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
            .cast("int")
            .alias("_shard"),
        )
        .repartition(shards, "_shard")
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list] = {}
        for pdf in batches:
            for key, files, shard in zip(
                pdf["_key"], pdf["_files"], pdf["_shard"]
            ):
                acc.setdefault(int(shard), []).append((key, files))
        rows = []
        for shard, samples in acc.items():
            samples.sort(key=lambda kv: kv[0])
            name = f"shard-{shard:0{width}d}.tar"
            buf = io.BytesIO()
            n_files = 0
            with tarfile.open(fileobj=buf, mode="w") as tar:
                for key, files in samples:
                    for ext in sorted(files):
                        body = bytes(files[ext])
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(body)  # mtime/uid/gid stay 0:
                        tar.addfile(info, io.BytesIO(body))  # deterministic
                        n_files += 1
            data = buf.getvalue()
            with open(os.path.join(path, name), "wb") as f:
                f.write(data)
            rows.append((name, len(samples), n_files, len(data)))
        yield pd.DataFrame(
            rows, columns=["shard", "n_samples", "n_files", "bytes"]
        )

    manifest = d.mapInPandas(_write, _MANIFEST_SCHEMA).collect()
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        for r in sorted(manifest, key=lambda r: r.shard):
            json.dump(r.asDict(), f)
            f.write("\n")
    return df.sparkSession.createDataFrame(manifest, _MANIFEST_SCHEMA)


def _split_member(name: str) -> tuple[str, str]:
    base = name.rsplit("/", 1)[-1]
    key, dot, ext = base.partition(".")
    if not key or not dot:
        raise ValueError(
            f"tar member {name!r} is not WebDataset-named (key.ext)"
        )
    return key, ext


def parse_wds_shard(data: bytes, *, shard: str = "") -> list[tuple]:
    """Split one tar shard into WDS_SCHEMA rows (pure function —
    testable without Spark, reused by the mapInPandas seam)."""
    try:
        tar = tarfile.open(fileobj=io.BytesIO(data), mode="r")
    except tarfile.TarError as e:
        raise ValueError(f"not a tar shard: {e}") from e
    rows = []
    with tar:
        for m in tar:
            if not m.isfile():
                continue
            key, ext = _split_member(m.name)
            rows.append((shard, key, ext, tar.extractfile(m).read()))
    return rows


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """One row per member file across every ``*.tar`` shard under
    ``path`` — `binaryFile` gives one task per shard, the split runs
    task-side.  Group with ``wds_samples`` to get one row per sample."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    )

    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WDS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    parse_wds_shard(
                        bytes(content), shard=fname.rsplit("/", 1)[-1]
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(_split, WDS_SCHEMA)


def wds_samples(members: DataFrame) -> DataFrame:
    """Regroup member rows to one row per sample:
    (key, files: map<ext, binary>) — the write-side shape, so
    read(write(df)) roundtrips."""
    return members.groupBy("key").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("ext", "payload")))
        ).alias("files")
    )
