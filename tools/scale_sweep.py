"""Measured scale sweep: run the headline queries at 1x / 4x / 16x the
sf0.1 data volume and record per-query scaling exponents.

SCALE.md argues structurally that every operator's plan survives a
100x scale-up (bounded build sides, single-shuffle aggs, pruned
scans).  This tool MEASURES it: it builds referentially-consistent
scaled copies of the testdata (fact keys offset per copy so join and
group cardinalities grow realistically; dimension tables stay fixed,
as they would at 100 TB; document text perturbed per copy so the
near-dup structure scales linearly instead of quadratically), runs
the same query functions the driver benches, and reports

    alpha = log(t_16x / t_4x) / log(4)

per query — the local scaling exponent between the two largest
scales (the smallest scale is overhead-dominated).  alpha <= ~1 means
linear-or-better; a query whose alpha drifts toward 2 has a hidden
all-pairs or unpruned stage and would NOT survive 100 TB.

Usage:
    python tools/scale_sweep.py [--scales 1,4,16] [--out SCALESWEEP.json]

Writes one JSON file and prints it; the scaled tables live under
/tmp/hbase_spark_scale/x{k}/ and are rebuilt only when absent.
"""

from __future__ import annotations

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from hbase_spark.sources.tables import TABLES, get_spark, load_table
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "/root/testdata/sf0.1"
SCALE_ROOT = "/tmp/hbase_spark_scale"

# Dimension tables are NOT scaled: a 100 TB deployment has the same
# 25 nations its 1 TB ancestor had.  Everything else is a fact table
# whose keys get a per-copy stride so copies stay disjoint and
# referential integrity holds within every copy (orders of copy i
# reference customers of copy i).
DIMS = {"region", "nation"}
STRIDES = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 1_000_000},
    # NOT 1_000_000: several query arms plant clones at id + 1_000_000,
    # and a 1M copy stride makes those clone ids COLLIDE with the next
    # copy's real ids (one id, two texts) — corrupting the dup
    # structure the sweep exists to measure (caught round 8: colliding
    # ids doubled the minhash verify's join rows at 16x/64x).  A 10M
    # stride keeps the within-copy +1M clone relation intact and the
    # id spaces disjoint (base ids < 1M at every bench SF).
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def _copy(df: DataFrame, table: str, i: int) -> DataFrame:
    if i == 0:
        return df
    for col, stride in STRIDES[table].items():
        df = df.withColumn(col, F.col(col) + F.lit(i * stride))
    if table == "documents":
        # Suffix every token with the copy id: within-copy near-dup
        # structure is preserved EXACTLY (the transform is a bijection
        # on tokens), while cross-copy shingle sets are disjoint — so
        # candidate pairs in MinHash/SimHash grow linearly with the
        # data, the way real corpora grow, not quadratically the way
        # verbatim copies would.  The suffix MUST survive the ASCII
        # tokenizer as part of its word ("x{i}x", alphanumeric): the
        # earlier "~{i}" form tokenized into a SEPARATE token between
        # every pair of words, halving shingle diversity and inflating
        # within-copy similarity — copy-sized LSH buckets that the
        # base corpus does not have (caught round 8 when the id-stride
        # fix stopped masking it).
        df = df.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}x")
        ).withColumn("n_chars", F.length("text"))
    if table == "embeddings":
        # Deterministic per-dimension jitter: copies are distinct
        # directions (no exact ties in top-k) but the same scale.
        df = df.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, j: (
                    x * (1.0 + ((j % 5) - 2) * F.lit(0.002 * i))
                ).cast("float"),
            ),
        )
    return df


def build_scaled(spark, k: int, tables: list[str] | None = None) -> str:
    """Materialize a k-times copy of every table (or a subset — large
    octaves like 64x only need the tables their target queries read)
    under SCALE_ROOT."""
    want = list(TABLES) if tables is None else sorted(set(tables) | DIMS)
    out = f"{SCALE_ROOT}/x{k}"
    marker = f"{out}/_BUILT"
    done = set()
    if os.path.exists(marker):
        with open(marker) as f:
            lines = f.read().split("\n")
        # legacy marker (time only) = every table was built
        done = set(lines[1:]) - {""} or set(TABLES)
        if set(want) <= done:
            return out
    t0 = time.time()
    for t in want:
        if t in done:
            continue
        df = load_table(spark, BASE, t)
        if t in ("documents", "embeddings"):
            # The 10M stride relies on base ids + the 1M clone offset
            # staying below the stride (ADVICE r8): a larger base SF
            # would silently re-introduce the clone-id collision the
            # stride fix addressed.  Fail loudly instead.
            id_col = "doc_id" if t == "documents" else "vec_id"
            mx = df.agg(F.max(id_col)).first()[0]
            stride = STRIDES[t][id_col]
            assert mx + 1_000_000 < stride, (
                f"{t}: max base {id_col}={mx} + 1M clone offset >= "
                f"stride {stride} — copy id spaces would collide; "
                f"raise the stride before sweeping this SF"
            )
        if t not in DIMS:
            df = functools.reduce(
                DataFrame.unionByName, [_copy(df, t, i) for i in range(k)]
            )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write(str(time.time() - t0) + "\n" + "\n".join(sorted(set(want) | done)))
    print(f"built x{k} in {time.time() - t0:.1f}s", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--out", default="SCALESWEEP.json")
    ap.add_argument("--names", default=",".join(bench.HEADLINE + bench.EXTENDED))
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list: build only these fact tables at each scale "
        "(dims always included); entrymod.prepare runs only when the "
        "subset includes the cell-layer tables (orders+lineitem) — "
        "for large octaves whose target queries read a table subset",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = args.names.split(",")
    tables = args.tables.split(",") if args.tables else None

    # local[32] shares ONE heap across 32 task threads — with the 1g
    # default that is ~32 MB/task, far below any real executor.  16g
    # (~512 MB/task) is still modest next to a production 4-8 GB
    # executor; must be set before the JVM launches.
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell"
    )
    # scaled corpora are immutable once their marker exists, so repeat
    # sightings trust completed on-disk layouts instead of re-writing
    # them in the timing process (heavy prep pollutes the next timed
    # query — the round-9 exact_substr lesson)
    os.environ.setdefault("HBASE_SPARK_LAYOUT_REUSE", "1")
    spark = get_spark("scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench.headline_queries()

    # codegen/JIT warmup at the smallest SF, exactly like bench.py
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            pass

    results: dict[str, dict[str, float]] = {}
    for k in scales:
        sf_dir = BASE if k == 1 else build_scaled(spark, k, tables)
        if tables is None or {"orders", "lineitem"} <= set(tables):
            # cell-layer queries scan persisted layouts (orders/lineitem
            # melts + struct keys) — build them untimed, like a
            # deployment; needs both source tables at this scale
            entrymod.prepare(spark, sf_dir)
        if "embedding_pq_topk" in names and (
            tables is None or "embeddings" in tables
        ):
            entrymod._pq_index_layout(spark, sf_dir)  # probe fixture
        if "doc_quality_classifier" in names and (
            tables is None or "documents" in tables
        ):
            entrymod._quality_clf(spark, sf_dir)  # score-arm fixture
        # settle after prep: fixture builds/layout writes that ARE
        # needed by a selected arm still churn the shared heap; a full
        # GC + pause keeps that cost out of the first timed query
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        times: dict[str, float] = {}
        for name in names:
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[name] = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                times[name] = -1.0
                print(
                    f"x{k} {name} FAILED: {type(exc).__name__}",
                    file=sys.stderr,
                    flush=True,
                )
            print(f"x{k} {name}: {times[name]}", file=sys.stderr, flush=True)
        results[str(k)] = times
        print(f"x{k}: total {sum(times.values()):.1f}s", file=sys.stderr)

    hi, mid = str(scales[-1]), str(scales[-2])
    ratio = scales[-1] / scales[-2]
    alpha = {
        n: round(
            math.log(max(results[hi][n], 1e-3) / max(results[mid][n], 1e-3))
            / math.log(ratio),
            2,
        )
        for n in names
    }
    payload = {
        "base": BASE,
        "scales": results,
        "alpha": alpha,
        "alpha_note": (
            f"log(t_{hi}x/t_{mid}x)/log({ratio:g}); <=1 linear-or-better, "
            "small queries are overhead-dominated (alpha near 0)"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
