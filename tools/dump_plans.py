"""Dump the executed physical plans of the headline queries to
PLANS.md — the evidence trail for plan-shape claims (broadcast masking,
pushdown, codegen spans).  Run: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from bench import EXTENDED, HEADLINE, headline_queries  # noqa: E402
from hbase_spark.sources.tables import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    entrymod.prepare(spark, sf_dir)
    queries = headline_queries()
    out = ["# PLANS — executed physical plans of the headline queries\n"]
    out.append(f"Scale: `{sf_dir}`; final AQE plans (post-materialization).\n")
    for name in HEADLINE + EXTENDED:
        df = queries[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("Initial Plan")[0].rstrip().rstrip("+-").rstrip()
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md with {len(HEADLINE + EXTENDED)} plans")


if __name__ == "__main__":
    main()
