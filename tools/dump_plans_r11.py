"""Dump `.explain("formatted")` for every bench arm into
plans/r11/<query>_<tag>.txt — the optimization round's evidence trail
(before/after plan shapes: Exchange count, join strategy,
PushedFilters/ReadSchema, codegen spans, Python eval nodes).

Usage: python tools/dump_plans_r11.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from bench import EXTENDED, HEADLINE, headline_queries  # noqa: E402
from hbase_spark.sources.tables import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    outdir = "/root/repo/plans/r11"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans_r11")
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.prepare(spark, sf_dir)
    entrymod._pq_index_layout(spark, sf_dir)
    entrymod._quality_clf(spark, sf_dir)
    queries = headline_queries()
    for name in HEADLINE + EXTENDED:
        if only and name not in only:
            continue
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
