"""Stage-split profile of remove_duplicated_substrings (the
doc_exact_substr arm) at 1x vs 16x — the SCVF treatment the round-7
verdict asked for (task 5): time each pipeline stage in isolation so
the residual has an owner.

Stages (functions/text.py remove_duplicated_substrings — round-9
cyclic-polynomial form; stage bodies below mirror the library
internals and must be kept in sync):
  tokenize  — split + posexplode of token positions
  grams     — O(tokens) rolling gram hash: per-token xxhash64 +
              position rotate, per-doc prefix-XOR window, lead/lag
              window difference (was O(tokens x n) concat+xxhash64)
  dup_agg   — gram-count hash agg + >=2 filter (the gram-count exchange)
  coverage  — dup-start join + per-doc RANGE window over positions
  full      — the whole arm incl. per-doc reassembly and the final join

Each stage is materialized through the noop sink in a fresh run order
(cheapest first) after a warmup at sf0.001.  Run SOLO (ambient load
swings 2-3x); repeat and report the spread.

Usage: python tools/profile_exact_substr.py [--scales 1,16] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hbase_spark.sources.tables import get_spark, load_table
from pyspark.sql import functions as F
from pyspark.sql import Window

SCALE_ROOT = "/tmp/hbase_spark_scale"
N = 8  # the arm's gram size


def _docs(spark, sf):
    return load_table(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(9)) == 4,
            F.concat_ws(" ", F.col("text"), F.lit(entrymod._XS_BLOCK)),
        )
        .when(
            F.pmod("doc_id", F.lit(9)) == 7,
            F.concat_ws(
                " ", F.lit(entrymod._XS_REPEAT), F.col("text"),
                F.lit(entrymod._XS_REPEAT),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _stages(spark, sf):
    # the gram stage comes from the LIBRARY seam — the profiler times
    # the real pipeline, never a copy that could drift
    from hbase_spark.functions.text import _ascii_tokens, _gram_hash_frames

    docs = _docs(spark, sf)
    base = docs.select(
        F.col("doc_id").alias("_id"), _ascii_tokens("text").alias("_t")
    )
    toks, starts = _gram_hash_frames(base, N)
    dup = (
        starts.groupBy("_gh")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_gh")
    )
    dup_starts = starts.join(dup, "_gh").select(
        "_id", F.col("_s").alias("_pos"), F.lit(1).alias("_d")
    )
    w = Window.partitionBy("_id").orderBy("_pos").rangeBetween(-(N - 1), 0)
    flagged = (
        toks.drop("_gh")
        .join(dup_starts, ["_id", "_pos"], "left")
        .withColumn("_cov", F.max("_d").over(w))
    )
    return {
        "tokenize": toks,
        "grams": starts,
        "dup_agg": dup,
        "coverage": flagged,
        "full": entrymod._exact_substr_arm(spark, sf),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,16")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="XSPROFILE.json")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    # same heap rule as scale_sweep: local[32] shares one heap across
    # 32 task threads; 16g ≈ 512 MB/task, set before the JVM launches
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell"
    )
    spark = get_spark("xsprof")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen + JIT on the smallest data
    for df in _stages(spark, "/root/testdata/sf0.001").values():
        df.write.format("noop").mode("overwrite").save()

    out: dict = {"runs": []}
    for r in range(args.runs):
        run: dict = {}
        for k in scales:
            sf = "/root/testdata/sf0.1" if k == 1 else f"{SCALE_ROOT}/x{k}"
            times = {}
            for name, df in _stages(spark, sf).items():
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times[name] = round(time.time() - t0, 2)
            run[f"x{k}"] = times
        out["runs"].append(run)
        print(json.dumps(run), file=sys.stderr)
    # per-stage 16x/1x ratio of the BEST sighting (ambient-load shield)
    if len(scales) == 2:
        a, b = f"x{scales[0]}", f"x{scales[1]}"
        best = {
            s: (
                min(r[a][s] for r in out["runs"]),
                min(r[b][s] for r in out["runs"]),
            )
            for s in out["runs"][0][a]
        }
        out["best_ratio"] = {
            s: round(hi / lo, 2) if lo > 0 else None
            for s, (lo, hi) in best.items()
        }
        out["best"] = {s: {a: lo, b: hi} for s, (lo, hi) in best.items()}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out.get("best_ratio", out)))


if __name__ == "__main__":
    main()
