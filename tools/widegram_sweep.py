"""Octave sweep for the ExactSubstr WIDE-gram fallback (round-9
verdict task 4): the rolling-hash octave (SCALESWEEP_xs_r9.json)
covers the n <= 64 cyclic-polynomial path at n=50; this tool measures
the n > 64 fallback (functions/text.py _gram_hash_frames else-branch:
xxhash64 over an n-long slice of pre-hashed tokens per start —
O(8n) bytes/start, the old constant's shape) at n=100 on the 16x/64x
documents octave.

Usage:
    python tools/widegram_sweep.py [--scales 16,64] [--n 100]
                                   [--out SCALESWEEP_widegram_r10.json]

Follows the BASELINE.md measurement protocol: run this in its own
fresh process in a quiet window; corpora build once (markered) so a
repeat sighting times only the query.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell"
)
os.environ.setdefault("HBASE_SPARK_LAYOUT_REUSE", "1")

from pyspark.sql import functions as F  # noqa: E402

from hbase_spark.functions.text import (  # noqa: E402
    remove_duplicated_substrings,
)
from hbase_spark.sources.tables import get_spark, load_table  # noqa: E402
from tools.scale_sweep import BASE, build_scaled  # noqa: E402


def _arm(spark, sf_dir: str, n: int):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicated_substrings(docs, n=n)
    return out.select(
        "doc_id", F.length("text").alias("_len"), "n_removed"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="16,64")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--out", default="SCALESWEEP_widegram_r10.json")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = get_spark("widegram_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # codegen warmup at the smallest SF (same discipline as bench.py)
    _arm(spark, "/root/testdata/sf0.001", args.n).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, float] = {}
    for k in scales:
        sf_dir = BASE if k == 1 else build_scaled(
            spark, k, tables=["documents"]
        )
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        t0 = time.time()
        _arm(spark, sf_dir, args.n).write.format("noop").mode(
            "overwrite"
        ).save()
        results[str(k)] = round(time.time() - t0, 3)
        print(f"x{k}: {results[str(k)]}s", file=sys.stderr, flush=True)

    payload = {
        "base": BASE,
        "n": args.n,
        "path": "widegram fallback (n > 64): xxhash64 over n-long "
                "slices of pre-hashed tokens per start",
        "scales": results,
    }
    if len(scales) >= 2:  # alpha needs a pair; never lose the timings
        hi, mid = str(scales[-1]), str(scales[-2])
        ratio = scales[-1] / scales[-2]
        payload["alpha"] = round(
            math.log(results[hi] / results[mid]) / math.log(ratio), 2
        )
        payload["alpha_note"] = (
            f"log(t_{hi}x/t_{mid}x)/log({ratio:g}); <=1 linear-or-better"
        )
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
