"""IntegrationTestLoadAndVerify analog (hbase-it
IntegrationTestLoadAndVerify.java, SURVEY.md §5.1): the load phase
writes rows whose columns back-reference previously written row keys;
the verify phase proves every reference resolves — set-based joins,
no driver-side walking (the mapreduce verify job's semantics).

The chaos arm deletes a slice of rows through tombstones and asserts
verify reports EXACTLY the references that pointed at them — a
verifier that can't name the broken refs can't debug a lost-write
incident at 100 TB.
"""

from pyspark.sql import functions as F

from hbase_spark.model import CellType, cell_schema
from hbase_spark.operators.resolve import resolve

N = 300
BACKREFS = (1, 7, 49)  # reference offsets, ITLV's NUM_BACKREFS shape


def key(i: int) -> str:
    return f"lv-{i % N:06d}"


def load_cells(spark):
    """The load phase as ONE distributed generate — no driver lists."""
    ids = spark.range(N)
    frames = []
    for j, off in enumerate(BACKREFS):
        frames.append(ids.select(
            F.concat(F.lit("lv-"),
                     F.lpad(F.col("id").cast("string"), 6, "0")).alias("row"),
            F.lit("l").alias("family"),
            F.lit(f"ref{j}").alias("qualifier"),
            F.lit(10).cast("long").alias("ts"),
            F.lit(int(CellType.PUT)).cast("int").alias("type"),
            F.concat(F.lit("lv-"),
                     F.lpad(F.pmod(F.col("id") - off, F.lit(N))
                            .cast("string"), 6, "0")).alias("value"),
            F.col("id").alias("seq"),
        ))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _verify(snap):
    """refs -> (referencing_row, ref) pairs that do NOT resolve."""
    rows = snap.select("row").distinct()
    refs = snap.select(F.col("row").alias("src"), F.col("value").alias("ref"))
    return refs.join(rows.withColumnRenamed("row", "ref"), "ref", "left_anti")


def test_load_then_verify_finds_no_broken_refs(spark):
    snap = resolve(load_cells(spark), versions=1)
    assert snap.count() == N * len(BACKREFS)
    assert _verify(snap).count() == 0


def test_verify_names_exactly_the_refs_broken_by_deletes(spark):
    cells = load_cells(spark)
    # tombstone every row in [100, 110) — DELETE_FAMILY kills all refs
    doomed = [key(i) for i in range(100, 110)]
    tombs = spark.createDataFrame(
        [(k, "l", None, 20, int(CellType.DELETE_FAMILY), None, 10_000)
         for k in doomed],
        schema=cell_schema(),
    )
    snap = resolve(cells.unionByName(tombs), versions=1).cache()
    assert snap.select("row").distinct().count() == N - 10

    broken = _verify(snap).collect()
    # exactly the references that pointed at a deleted row, no others
    expected = {
        (key(i + off), key(i))
        for i in range(100, 110)
        for off in BACKREFS
        if not (100 <= (i + off) % N < 110)  # referer itself deleted -> gone
    }
    assert {(r["src"], r["ref"]) for r in broken} == expected
