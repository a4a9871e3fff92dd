"""Aggregation endpoint parity vs DuckDB oracle on TESTDATA (SURVEY.md
§5.2 item 3), plus counters and SyncTable diff (FIXTURES.md §B)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hbase_spark.model import CellType
from hbase_spark.operators.aggregations import agg_table, row_count
from hbase_spark.operators.counters import cell_counter, row_counter
from hbase_spark.operators.resolve import resolve
from hbase_spark.operators.sync import diff_buckets, sync_diff, sync_repair
from hbase_spark.sources.melt import melt_table
from hbase_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def li_cells(spark, sf_dir):
    # NOTE: the synthetic lineitem has duplicate (orderkey, linenumber)
    # pairs, so a unique per-source-row id is required for a faithful melt
    li = load_table(spark, sf_dir, "lineitem").filter("l_orderkey <= 2000")
    df = li.withColumn("pk", F.monotonically_increasing_id())
    return melt_table(
        df, "pk", "li", ["l_quantity", "l_extendedprice", "l_returnflag"], key_width=16
    ).cache()


def test_agg_endpoint_vs_duckdb(spark, sf_dir, li_cells):
    visible = resolve(li_cells, versions=1)
    got = agg_table(visible, "li", "l_quantity", interpreter="decimal").collect()[0]
    exp = duckdb.sql(
        f"""
        WITH t AS (SELECT cast(cast(l_quantity as decimal(18,2)) as decimal(38,10)) q
                   FROM '{sf_dir}/lineitem.parquet'
                   WHERE l_orderkey <= 2000)
        SELECT max(q), min(q), sum(q), count(q), avg(q),
               stddev_pop(q), median(q) FROM t
        """
    ).fetchone()
    assert float(got["max"]) == pytest.approx(float(exp[0]))
    assert float(got["min"]) == pytest.approx(float(exp[1]))
    assert float(got["sum"]) == pytest.approx(float(exp[2]))
    assert got["count"] == exp[3]
    assert float(got["avg"]) == pytest.approx(float(exp[4]))
    assert float(got["std"]) == pytest.approx(float(exp[5]), rel=1e-6)
    assert float(got["median"]) == pytest.approx(float(exp[6]))


def test_median_two_phase_matches_exact_percentile(spark, sf_dir, li_cells):
    from hbase_spark.operators.aggregations import median_two_phase

    visible = resolve(li_cells, versions=1).filter(
        (F.col("family") == "li") & (F.col("qualifier") == "l_quantity")
    )
    v = F.col("value").cast("decimal(18,2)").cast("decimal(38,10)")
    exact = visible.agg(
        F.expr("percentile(cast(value as double), 0.5)")
    ).first()[0]
    # final_cap=50 forces multiple histogram-narrowing rounds; the
    # answer must equal the unbounded-buffer percentile regardless
    got = median_two_phase(visible, v, buckets=16, final_cap=50)
    assert float(got) == pytest.approx(float(exact))
    # and with the scale defaults (single top-k, no histogram round)
    got2 = median_two_phase(visible, v)
    assert float(got2) == pytest.approx(float(exact))


@pytest.mark.parametrize(
    "vals",
    [
        [1.0],
        [1.0, 2.0],
        [3.0, 1.0, 2.0],
        [5.0, 5.0, 5.0, 5.0],          # all tied: double range collapses
        [1.0, 1.0, 2.0, 100.0, 100.0],  # skewed with ties at the middle
        [-4.5, 0.0, 0.0, 7.25, 7.25, 9.0],
        # ulp-adjacent cluster: bucket widths hit double-rounding, the
        # case that breaks reconstructed lo + b*w edges (the narrowing
        # carries per-bucket ACTUAL extrema instead — r8 fix)
        [
            math.nextafter(1.0, 0.0),
            1.0,
            math.nextafter(1.0, 2.0),
            math.nextafter(math.nextafter(1.0, 2.0), 2.0),
            1.0 + 3e-16,
        ],
    ],
)
def test_median_two_phase_small_lists(spark, vals):
    from hbase_spark.operators.aggregations import median_two_phase

    df = spark.createDataFrame([(v,) for v in vals], "value double")
    exact = df.agg(F.expr("percentile(value, 0.5)")).first()[0]
    got = median_two_phase(df, F.col("value"), buckets=4, final_cap=1)
    assert float(got) == pytest.approx(float(exact))


def test_median_tie_run_never_issues_rank_sized_limit(spark, monkeypatch):
    """Round-8 verdict item 1: when narrowing exits on a massive tie run
    (stall guard or ``lo == hi``), the final selection must stay
    rank-BOUNDED — a ``limit(k2)`` with rank-sized k2 would materialize
    the whole tie run through TakeOrdered's driver-side merge.  Guard by
    recording every ``DataFrame.limit(n)`` issued during the call and
    asserting none exceeds ``final_cap``."""
    from hbase_spark.operators.aggregations import median_two_phase

    # patch the CONCRETE DataFrame class (pyspark 4 routes the
    # pyspark.sql.DataFrame facade to a classic/connect subclass that
    # overrides limit(), so patching the facade is a no-op)
    cls = type(spark.range(1))
    limits: list[int] = []
    orig = cls.limit

    def spy(self, n):
        limits.append(n)
        return orig(self, n)

    monkeypatch.setattr(cls, "limit", spy)
    cap = 100

    # 1) all-tied column: min == max, narrowing never runs, c_n huge
    df = spark.range(200_000).select(F.lit(7).cast("long").alias("v"))
    assert median_two_phase(df, F.col("v"), buckets=16, final_cap=cap) == 7
    # 2) middle straddles a 100k tie run with distinct neighbours
    df = (
        spark.range(102_000)
        .select(
            F.when(F.col("id") < 1_000, 1)
            .when(F.col("id") < 101_000, 5)
            .otherwise(9)
            .cast("long")
            .alias("v")
        )
    )
    assert median_two_phase(df, F.col("v"), buckets=16, final_cap=cap) == 5
    # 3) even count, two middle ranks in DIFFERENT tie runs (the stall
    #    guard trips: no round can separate them)
    df = spark.range(1_000).select(
        F.when(F.col("id") < 500, 1).otherwise(2).cast("long").alias("v")
    )
    got = median_two_phase(df, F.col("v"), buckets=4, final_cap=cap)
    assert float(got) == pytest.approx(1.5)
    # 4) distinct values under the cap: takes the ordered-limit path,
    #    proving the spy actually observes limit() calls
    df = spark.range(51).select(F.col("id").cast("long").alias("v"))
    assert median_two_phase(df, F.col("v"), buckets=16, final_cap=cap) == 25

    assert limits, "spy never saw a limit — selection path changed?"
    assert max(limits) <= cap, f"rank-sized limit issued: {max(limits)}"


def test_grouped_median_fast_path_skips_narrowing(spark, monkeypatch):
    """Round-8 verdict item 7 (group-cardinality axis): when EVERY
    group is under final_cap, the narrowing loop must not run at all —
    the state scan decides in one isEmpty and the median comes from
    the single rank-selection window.  The loop body is observable at
    the unionByName seam (one call per narrowing round)."""
    from hbase_spark.operators.aggregations import grouped_median_two_phase

    cls = type(spark.range(1))
    unions = []
    orig = cls.unionByName

    def spy(self, other, *a, **kw):
        unions.append(1)
        return orig(self, other, *a, **kw)

    monkeypatch.setattr(cls, "unionByName", spy)
    # 50k rows, 500 groups of 100 rows — all far under final_cap
    df = spark.range(50_000).select(
        (F.col("id") % 500).alias("grp"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
    )
    got = {
        r["grp"]: r["median"]
        for r in grouped_median_two_phase(
            df, F.col("v"), ["grp"]
        ).collect()
    }
    assert not unions, f"narrowing ran {len(unions)} rounds on small groups"
    exp = {
        r["grp"]: r["m"]
        for r in df.groupBy("grp")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    assert got == pytest.approx(exp)
    # and the mixed case narrows ONLY while a big group needs it: one
    # 30k-row group over a forced tiny cap next to 499 small groups
    unions.clear()
    skew = spark.range(80_000).select(
        F.when(F.col("id") < 30_000, F.lit(0))
        .otherwise(F.col("id") % 499 + 1)
        .alias("grp"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
    )
    got2 = {
        r["grp"]: r["median"]
        for r in grouped_median_two_phase(
            skew, F.col("v"), ["grp"], buckets=16, final_cap=1000
        ).collect()
    }
    exp2 = {
        r["grp"]: r["m"]
        for r in skew.groupBy("grp")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    assert got2 == pytest.approx(exp2)
    assert unions, "expected narrowing rounds with final_cap=1000"


def test_row_count_and_cell_counter(spark, li_cells):
    visible = resolve(li_cells, versions=1)
    n = visible.select("row").distinct().count()
    assert row_count(visible) == row_counter(visible) == n
    counters = cell_counter(visible)
    assert counters["total_cells"].collect()[0]["cells"] == 3 * n
    fam = counters["cells_per_family"].collect()
    assert len(fam) == 1 and fam[0]["family"] == "li" and fam[0]["cells"] == 3 * n
    per_q = {
        r.qualifier: r.cells for r in counters["cells_per_qualifier"].collect()
    }
    assert per_q == {
        "l_quantity": n,
        "l_extendedprice": n,
        "l_returnflag": n,
    }


def test_sync_diff_finds_exact_perturbations(spark, li_cells):
    src = li_cells
    # perturb: change 5 values, drop 3 cells, add 2 cells
    first_rows = [r.row for r in src.select("row").distinct().orderBy("row").limit(3).collect()]
    changed = src.filter(
        (F.col("qualifier") == "l_returnflag") & F.col("row").isin(first_rows)
    )
    n_changed = changed.count()
    assert n_changed > 0
    tgt = (
        src.join(changed.select("row", "qualifier"), ["row", "qualifier"], "left_anti")
        .unionByName(changed.withColumn("value", F.lit("XX")))
    )
    dropped = src.filter(
        (F.col("qualifier") == "l_quantity") & F.col("row").isin(first_rows)
    )
    n_dropped = dropped.count()
    assert n_dropped > 0
    tgt = tgt.join(
        dropped.select("row", "qualifier"), ["row", "qualifier"], "left_anti"
    )
    extra = spark.createDataFrame(
        [("zzz-row", "li", "l_quantity", 1, CellType.PUT, "42", 0)],
        schema=src.schema,
    )
    tgt = tgt.unionByName(extra)

    d = sync_diff(src, tgt)
    by_kind = {r.kind: r.cells for r in d.groupBy("kind").agg(F.count("*").alias("cells")).collect()}
    assert by_kind.get("value_mismatch", 0) == n_changed
    assert by_kind.get("only_in_source", 0) == n_dropped
    assert by_kind.get("only_in_target", 0) == 1

    # bucket digests catch the divergence cheaply
    assert diff_buckets(src, tgt).count() > 0
    # repair converges: diff(source, repaired) is empty
    repaired = sync_repair(src, tgt)
    assert sync_diff(src, repaired).count() == 0
    assert diff_buckets(src, repaired).count() == 0


def test_median_mass_midpoint_by_hand(spark):
    """The reference's key-ordered median walk (AggregationClient.java
    :796-869): return the value of the last row BEFORE the cumulative
    weight exceeds half the total."""
    from pyspark.sql import functions as F

    from hbase_spark.operators.aggregations import median_mass_midpoint

    df = spark.createDataFrame(
        [("k01", 10, 1.0), ("k02", 20, 2.0), ("k03", 30, 3.0),
         ("k04", 40, 4.0)],
        "k string, v long, w double",
    )
    # total 10, half 5: cum 1, 3, then 6 > 5 -> last value before = 20
    got = median_mass_midpoint(
        df, F.col("v"), F.col("w"), F.col("k"), prefix_len=3
    )
    assert got == 20

    # unweighted reference form: weight IS the value
    vals = spark.createDataFrame(
        [("k1", 1), ("k2", 2), ("k3", 3), ("k4", 4)], "k string, v long"
    )
    got = median_mass_midpoint(
        vals, F.col("v"), F.col("v"), F.col("k"), prefix_len=2
    )
    assert got == 2

    # first row already crosses half -> reference returns null
    first = spark.createDataFrame(
        [("k1", 7, 10.0), ("k2", 8, 1.0)], "k string, v long, w double"
    )
    assert (
        median_mass_midpoint(first, F.col("v"), F.col("w"), F.col("k"))
        is None
    )


def test_median_mass_midpoint_bucket_carry(spark):
    """Phase-1 bucket boundaries must not change the answer: the
    straddling bucket's first row can cross half, in which case the
    previous bucket's LAST row is the answer (the carry-in path)."""
    from pyspark.sql import functions as F

    from hbase_spark.operators.aggregations import median_mass_midpoint

    df = spark.createDataFrame(
        [("a1", 100, 1.0), ("a2", 200, 1.0), ("b1", 300, 4.0)],
        "k string, v long, w double",
    )
    # total 6, half 3: a-bucket sums 2 (moving), b1 crosses -> a2's value
    got = median_mass_midpoint(
        df, F.col("v"), F.col("w"), F.col("k"), prefix_len=1
    )
    assert got == 200
    # and with one bucket per row the walk is identical
    got = median_mass_midpoint(
        df, F.col("v"), F.col("w"), F.col("k"), prefix_len=2
    )
    assert got == 200


def test_agg_median_weighted_over_cellframe(spark):
    """AggregationClient.median's two-qualifier weighted form over a
    resolved CellFrame: value in one qualifier, weight in another,
    matched by row."""
    from hbase_spark.operators.aggregations import agg_median_weighted

    rows = []
    weights = {1: 1, 2: 2, 3: 3, 4: 4}
    for i, w in weights.items():
        rows.append((f"r{i}", "f", "val", 1, 4, str(i * 10), i))
        rows.append((f"r{i}", "f", "wgt", 1, 4, str(w), i))
    visible = spark.createDataFrame(
        rows,
        "row string, family string, qualifier string, ts long, "
        "type int, value string, seq long",
    )
    got = agg_median_weighted(visible, "f", "val", "wgt")
    assert got == 20


def test_agg_table_default_plan_has_no_percentile_buffer(spark, li_cells):
    """The DEFAULT agg_table call must never plan an unbounded
    percentile buffer (round-6 verdict item): ungrouped exact median
    routes through the bounded two-phase protocol, so neither the
    returned frame's plan nor its lineage contains percentile();
    since round 8 the grouped default is bounded too (see the grouped
    plan guard below)."""
    visible = resolve(li_cells, versions=1)
    out = agg_table(visible, "li", "l_quantity", interpreter="decimal")
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "percentile" not in plan.lower()
    # approx opt-out keeps a bounded sketch (never plain percentile)
    approx = agg_table(
        visible, "li", "l_quantity", interpreter="decimal",
        exact_median=False,
    )
    aplan = approx._jdf.queryExecution().analyzed().toString()
    assert "percentile_approx" in aplan.lower()
    assert "percentile(" not in aplan.lower().replace("percentile_approx(", "")


def test_grouped_median_two_phase_matches_percentile(spark, sf_dir, li_cells):
    """The grouped bounded median (round-7 verdict item 2) must equal
    the unbounded per-group percentile() it replaces — both with the
    scale defaults (no narrowing round at test volume) and with
    final_cap forced low enough that every group takes multiple
    histogram rounds."""
    from hbase_spark.operators.aggregations import grouped_median_two_phase

    visible = resolve(li_cells, versions=1).filter(
        (F.col("family") == "li") & (F.col("qualifier") == "l_quantity")
    )
    # group by last hex digit of the row key: ~16 groups, mixed sizes
    g = visible.withColumn("grp", F.substring("row", 16, 1))
    v = F.col("value").cast("decimal(18,2)").cast("decimal(38,10)")
    exp = {
        r["grp"]: r["m"]
        for r in g.groupBy("grp")
        .agg(F.expr("percentile(cast(value as double), 0.5)").alias("m"))
        .collect()
    }
    for kwargs in ({}, {"buckets": 16, "final_cap": 20}):
        got = {
            r["grp"]: r["median"]
            for r in grouped_median_two_phase(g, v, ["grp"], **kwargs).collect()
        }
        assert got.keys() == exp.keys()
        for k in exp:
            assert got[k] == pytest.approx(exp[k]), (k, kwargs)


@pytest.mark.parametrize(
    "vals",
    [
        [("a", 1.0)],
        [("a", 1.0), ("a", 2.0), ("b", 7.0)],
        [("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 2.0)],
        [("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 100.0), ("a", 100.0),
         ("b", -4.5), ("b", 0.0), ("b", 0.0), ("b", 7.25)],
        # ulp-adjacent cluster (see the ungrouped twin): per-bucket
        # exact extrema must keep every rank-counted value in range
        [("a", math.nextafter(1.0, 0.0)), ("a", 1.0),
         ("a", math.nextafter(1.0, 2.0)), ("a", 1.0 + 3e-16),
         ("a", math.nextafter(math.nextafter(1.0, 2.0), 2.0)),
         ("b", 1e-300), ("b", math.nextafter(1e-300, 1.0)), ("b", 2e-300)],
    ],
)
def test_grouped_median_two_phase_small_lists(spark, vals):
    from hbase_spark.operators.aggregations import grouped_median_two_phase

    df = spark.createDataFrame(vals, "g string, value double")
    exp = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    got = {
        r["g"]: r["median"]
        for r in grouped_median_two_phase(
            df, F.col("value"), ["g"], buckets=4, final_cap=1
        ).collect()
    }
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k])


def test_agg_table_grouped_default_plan_has_no_percentile_buffer(
    spark, li_cells
):
    """Round-7 verdict item 2: the grouped DEFAULT must not plan an
    unbounded percentile() buffer either — the median column comes
    from the two-phase frame (window rank selection over bounded
    candidates), and a grouped result row still carries all the
    endpoint aggregates plus the exact median."""
    visible = resolve(li_cells, versions=1)
    g = visible.withColumn("grp", F.substring("row", 16, 1))
    out = agg_table(
        g, "li", "l_quantity", interpreter="decimal", group_by=["grp"]
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "percentile" not in plan.lower()
    rows = {r["grp"]: r for r in out.collect()}
    pct = {
        r["grp"]: r["m"]
        for r in resolve(li_cells, versions=1)
        .withColumn("grp", F.substring("row", 16, 1))
        .filter((F.col("family") == "li") & (F.col("qualifier") == "l_quantity"))
        .groupBy("grp")
        .agg(F.expr("percentile(cast(value as double), 0.5)").alias("m"))
        .collect()
    }
    assert rows.keys() == pct.keys()
    for k, r in rows.items():
        assert r["median"] == pytest.approx(pct[k])
        assert r["count"] > 0 and r["max"] is not None
