"""IntegrationTestBigLinkedList analog (hbase-it
IntegrationTestBigLinkedList.java, SURVEY.md §5.1): build a circular
linked list in row keys (each node's value = the next node's key),
subject the table to a mutation storm (re-puts, masked deletes,
resurrections), then verify referential integrity of the resolved
snapshot with set-based joins — no driver-side walking.

Invariants of a circular list over the visible snapshot:
- every pointer targets an existing visible row;
- every node has in-degree exactly 1;
- the pointer permutation has a single cycle covering all nodes
  (verified by walking with log2(N) squarings, not N steps).
"""

from pyspark.sql import functions as F

from hbase_spark.model import CellType, cell_schema
from hbase_spark.operators.resolve import resolve

N = 64


def key(i: int) -> str:
    return f"node-{i % N:04d}"


def build_cells(spark):
    cells = []
    seq = 0
    # the ring at ts=10
    for i in range(N):
        cells.append((key(i), "m", "next", 10, CellType.PUT, key(i + 1), seq))
        seq += 1
    # mutation storm: re-put every third node's pointer (same target,
    # newer version), delete every seventh node's pointer then restore it
    for i in range(0, N, 3):
        cells.append((key(i), "m", "next", 20, CellType.PUT, key(i + 1), seq))
        seq += 1
    for i in range(0, N, 7):
        cells.append((key(i), "m", "next", 25, CellType.DELETE_COLUMN, None, seq))
        seq += 1
        cells.append((key(i), "m", "next", 30, CellType.PUT, key(i + 1), seq))
        seq += 1
    return spark.createDataFrame(cells, schema=cell_schema())


def test_linked_list_referential_integrity(spark):
    snap = resolve(build_cells(spark), versions=1).cache()
    assert snap.count() == N

    nodes = snap.select(F.col("row").alias("node"), F.col("value").alias("nxt"))
    # every pointer resolves to an existing node
    dangling = nodes.join(
        nodes.select(F.col("node").alias("nxt")), "nxt", "left_anti"
    )
    assert dangling.count() == 0
    # in-degree exactly 1 for every node
    indeg = nodes.groupBy("nxt").count()
    assert indeg.filter("count != 1").count() == 0

    # single cycle covering all nodes: self-compose the reachability
    # relation log2(N) times (distance doubles each round, covering all
    # intermediate distances); node-0000 must reach every node
    closure = nodes  # all paths of length 1..k after k rounds
    hops = 1
    while hops < N:
        step = (
            closure.alias("a")
            .join(closure.alias("b"), F.col("a.nxt") == F.col("b.node"))
            .select(F.col("a.node").alias("node"), F.col("b.nxt").alias("nxt"))
        )
        closure = closure.unionByName(step).distinct().cache()
        hops *= 2
    reachable_from_0 = closure.filter(F.col("node") == key(0)).select("nxt")
    assert reachable_from_0.distinct().count() == N
