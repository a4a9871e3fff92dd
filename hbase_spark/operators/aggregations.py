"""Aggregations — the AggregationClient / AggregateImplementation
endpoint re-expressed as Catalyst aggregates (SURVEY.md §2.6).

The reference computes each aggregate as a server-side partial per
region + client-side final merge
(endpoint/coprocessor/AggregateImplementation.java; client
endpoint/client/coprocessor/AggregationClient.java) — exactly the
partial/final split Spark's agg() generates automatically, so every
one of these is a single declarative aggregate.

``ColumnInterpreter`` typed views (LongColumnInterpreter etc.) become
casts: interpreter='long' | 'double' | 'decimal'.

The reference supports only a single group (the scan range); we expose
the same single-group calls plus the natural group_by generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INTERPRETERS = {
    "long": "long",          # LongColumnInterpreter
    "double": "double",      # DoubleColumnInterpreter
    "decimal": "decimal(38,10)",  # BigDecimalColumnInterpreter
}


def _typed(col: str | Column, interpreter: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_INTERPRETERS[interpreter])


def agg_table(
    visible: DataFrame,
    family: str,
    qualifier,
    *,
    interpreter: str = "long",
    group_by: list[str] | None = None,
    exact_median: bool | None = True,
) -> DataFrame:
    """All endpoint aggregates in one pass over a resolved CellFrame.

    max/min/sum/count/avg/std: AggregateImplementation.java:84,143,201,
    260,325,401.  median (:483 — the reference needs a two-phase
    weighted-median scan) is exact by DEFAULT and bounded by default:

    - **ungrouped** (the endpoint shape): the reference's two-phase
      protocol via ``median_two_phase`` — phase-1 stats are shared
      with the endpoint aggregate row, so the median costs one extra
      bounded scan and NO plan ever holds an unbounded percentile
      buffer.  The result row is assembled client-side, exactly like
      AggregationClient's partial merge (this makes the ungrouped
      call eager — it was always consumed eagerly).
    - **grouped** ``exact_median=True``: the SAME two-phase protocol
      generalized per group (``grouped_median_two_phase``) — phase-1
      stats come from one grouped agg, histogram-narrowing rounds are
      themselves distributed (hash-agg + cumulative window; no
      per-group driver loop, so any group cardinality works), and the
      final per-group rank selection runs over narrowed candidates
      with a spillable window sort.  No plan holds an unbounded
      in-memory ``percentile()`` buffer, so a skewed group cannot OOM
      an executor; groups under ``final_cap`` rows skip narrowing
      entirely.  Like the ungrouped default this makes the call eager.
    - ``exact_median=False``: ``percentile_approx`` everywhere — a
      fixed-size, map-side-combinable sketch (the 1e-4 quantile error
      path when even per-group candidate sorting is too much).
    - ``exact_median=None``: no median column at all — the free path
      for callers that only read the other aggregates.
    """
    v = _typed("value", interpreter)
    cells = visible.filter(
        (F.col("family") == family) & (F.col("qualifier") == qualifier)
    )
    base_aggs = [
        F.max(v).alias("max"),
        F.min(v).alias("min"),
        F.sum(v).alias("sum"),
        F.count(v).alias("count"),
        F.avg(v).alias("avg"),
        F.stddev_pop(v).alias("std"),
    ]
    typed_sql = f"cast(value as {_INTERPRETERS[interpreter]})"
    if exact_median is None:
        if group_by:
            return cells.groupBy(*group_by).agg(*base_aggs)
        return cells.agg(*base_aggs)
    if not exact_median:
        aggs = base_aggs + [
            F.expr(f"percentile_approx({typed_sql}, 0.5)").alias("median")
        ]
        if group_by:
            return cells.groupBy(*group_by).agg(*aggs)
        return cells.agg(*aggs)
    if group_by:
        # checkpointed so the endpoint-stats scan runs ONCE: the median
        # protocol's phase 1 reads (count, min, max) straight from this
        # frame — the grouped twin of the ungrouped stats= sharing
        base = cells.groupBy(*group_by).agg(*base_aggs).localCheckpoint(
            eager=False
        )
        med = grouped_median_two_phase(cells, v, group_by, stats=base)
        # all-null-value groups carry count 0 in base and no median row
        return base.join(med, group_by, "left")
    # ungrouped exact: two-phase protocol, stats shared with the
    # endpoint row — the default plan is bounded at any row count
    agg_df = cells.agg(*base_aggs)
    row = agg_df.first()
    med = (
        None
        if not row["count"]
        else median_two_phase(
            cells, v, stats=(row["count"], row["min"], row["max"])
        )
    )
    spark = visible.sparkSession
    return spark.createDataFrame([row], agg_df.schema).withColumn(
        "median", F.lit(None if med is None else float(med)).cast("double")
    )


def _single(visible, family, qualifier, interpreter, expr_fn,
            exact_median: bool | None = None):
    # the scalar helpers read ONE field — skip the median column
    # entirely rather than paying even an approx sketch for a value
    # the caller discards; agg_median opts back in explicitly
    row = agg_table(
        visible, family, qualifier, interpreter=interpreter,
        exact_median=exact_median,
    ).collect()[0]
    return expr_fn(row)


def agg_max(visible, family, qualifier, interpreter="long"):
    """AggregationClient.max — endpoint/client/.../AggregationClient.java:228."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["max"])


def agg_min(visible, family, qualifier, interpreter="long"):
    """AggregationClient.min — AggregationClient.java:295."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["min"])


def agg_sum(visible, family, qualifier, interpreter="long"):
    """AggregationClient.sum — AggregationClient.java:437."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["sum"])


def agg_avg(visible, family, qualifier, interpreter="long"):
    """AggregationClient.avg — (sum, count) pair merged client-side."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["avg"])


def agg_std(visible, family, qualifier, interpreter="long"):
    """AggregationClient.std — AggregationClient.java:675."""
    return _single(visible, family, qualifier, interpreter, lambda r: r["std"])


def agg_median(visible, family, qualifier, interpreter="long"):
    """AggregationClient.median — AggregationClient.java:778,796.
    Exact via the bounded two-phase protocol (the one scalar helper
    that actually consumes the median field)."""
    return _single(
        visible, family, qualifier, interpreter,
        lambda r: r["median"], exact_median=True,
    )


def median_two_phase(
    df: DataFrame,
    value: Column,
    *,
    buckets: int = 4096,
    final_cap: int = 65536,
    stats: tuple | None = None,
):
    """Exact median without an unbounded aggregation buffer.

    The reference's median is a two-phase protocol: a first scan
    collects per-region (sum, weight) partials and the client picks the
    region straddling half the total weight, then a second, targeted
    scan walks only that region in order
    (AggregateImplementation.java:483-539, AggregationClient.java:778).
    This is the same idea generalized to value-range buckets so it
    holds at any row count:

    1. one scan for (count, min, max) of the value column;
    2. iterated range-bucket histograms (a map-side-combinable
       hash-agg; ``buckets`` rows collected per round) that narrow the
       candidate range containing the middle rank(s) until at most
       ``final_cap`` candidates remain — each round divides the
       candidate count by ~``buckets``, so 1e12 rows need 2 rounds;
    3. a distributed top-k (``orderBy().limit(k)``) over the
       candidates only.

    ``final_cap`` trades narrowing rounds against the final sort: the
    rank selection is a GLOBAL ordered limit (one partition at the
    limit), so a smaller cap is also FASTER once the input outgrows a
    few hundred thousand rows — measured at sf0.1 (600k rows), one
    4096-bucket histogram round + a tiny sort beats sorting the whole
    column ~2x.  65536 keeps 1e12 rows at 2 rounds (each round divides
    by ~4096).  The grouped twin keeps a larger default: its final
    window sort parallelizes per group, so the round overhead only
    pays off at much larger per-group counts.

    Every phase is a bounded driver result; no executor ever buffers
    more than one histogram or ``final_cap`` ordered values.  Returns
    the interpolated median (mean of the two middle values for even
    counts — the continuous-percentile convention of both Spark's
    ``percentile`` and DuckDB's ``median``) as a Python number, to be
    merged client-side exactly like the reference's AggregationClient.
    """
    vals = df.select(value.alias("_v")).filter(F.col("_v").isNotNull())
    dv = F.col("_v").cast("double")
    if stats is not None:
        # caller already aggregated (count, min, max) — e.g. the main
        # endpoint aggregate row — so phase 1 costs nothing extra and
        # the whole median is ONE additional scan, matching the
        # reference's two-scan protocol exactly
        n, lo, hi = stats
        lo, hi = float(lo), float(hi)
    else:
        n, lo, hi = vals.agg(F.count("_v"), F.min(dv), F.max(dv)).first()
    if not n:
        return None
    # 1-indexed middle ranks (equal for odd n)
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    cand, c_n = vals, n
    # Narrow by histogram until the middle ranks sit in <= final_cap
    # candidates.  Bucket on the double cast (monotone with every
    # interpreter type, so rank-by-bucket == rank-by-value across
    # buckets); the final sort uses the exact typed value.
    #
    # Progress guard: when the middle ranks straddle a tie run (or two
    # values that a shrinking range never separates — an even count
    # whose two middle values both stay in the kept bucket span), a
    # round narrows the RANGE without shrinking the CANDIDATE set;
    # without the guard that loops ~500 rounds to double underflow with
    # a filter chained onto the plan each round.  Two consecutive
    # no-progress rounds -> stop narrowing and let the final top-k
    # resolve the remainder exactly (it is bounded by the last c_n).
    stalled = 0
    while c_n > final_cap and hi > lo and stalled < 2:
        w = (hi - lo) / buckets
        if w <= 0.0:  # double-precision underflow: all-but-tied values
            break
        prev_c_n = c_n
        bidx = F.least(
            F.floor((dv - F.lit(lo)) / F.lit(w)), F.lit(buckets - 1)
        ).cast("int")
        # per-bucket ACTUAL min/max, not reconstructed lo + b*w edges:
        # floor((v-lo)/w) and the rebuilt boundary can disagree by one
        # ulp, silently dropping a rank-counted value from the next
        # candidate set.  Bucket index is monotone in value, so the
        # exact [min of b1, max of b2] interval selects precisely the
        # straddling span.
        hist = {
            r["_b"]: (r["_c"], r["_mn"], r["_mx"])
            for r in cand.groupBy(bidx.alias("_b")).agg(
                F.count("*").alias("_c"),
                F.min(dv).alias("_mn"),
                F.max(dv).alias("_mx"),
            ).collect()
        }
        cum, b1, b2 = 0, None, None
        for b in range(buckets):
            c = hist.get(b, (0, None, None))[0]
            if b1 is None and cum + c >= k1:
                b1 = b
                below = cum
            if cum + c >= k2:
                b2 = b
                break
            cum += c
        lo, hi = hist[b1][1], hist[b2][2]
        # fresh range filter on the base projection (nested intervals),
        # not a chained bucket filter — keeps the plan depth constant
        cand = vals.filter(dv.between(F.lit(lo), F.lit(hi)))
        c_n = sum(
            hist.get(b, (0, None, None))[0] for b in range(b1, b2 + 1)
        )
        k1, k2 = k1 - below, k2 - below
        stalled = stalled + 1 if c_n >= prev_c_n else 0
    if c_n <= final_cap:
        # ties collapsed the double range are resolved by this exact
        # sort.  Both middle ranks come out of ONE job: the ordered
        # top-k2 frame's last two rows (k1 = k2 or k2-1 by
        # construction); k2 <= c_n <= final_cap so the global ordered
        # limit is cap-bounded, never rank-sized.
        t = cand.orderBy("_v").limit(k2).tail(1 if k1 == k2 else 2)
        lo_v, hi_v = t[0]._v, t[-1]._v
    else:
        # Narrowing exited on a tie run (stall guard, lo == hi, or ulp
        # underflow) with c_n still above the cap.  A rank-SIZED
        # ``limit(k2)`` here would materialize the whole tie run (a
        # billion identical values) through TakeOrdered's driver merge.
        # Instead select the ranks over DISTINCT values: a tie-run exit
        # means the candidate mass is concentrated on few distinct
        # values, so the per-value count frame is tiny even when c_n is
        # enormous, and the cumulative-rank window over it is bounded by
        # the distinct count, not the row count.  The straddling rows
        # for both middle ranks (``_cum - _c < k`` and ``_cum >= k``)
        # are at most two, collected in one job.
        dist = cand.groupBy("_v").agg(F.count("*").alias("_c"))
        cw = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
        cum = dist.withColumn("_cum", F.sum("_c").over(cw))
        straddle = cum.filter(
            ((F.col("_cum") - F.col("_c") < k1) & (F.col("_cum") >= k1))
            | ((F.col("_cum") - F.col("_c") < k2) & (F.col("_cum") >= k2))
        ).orderBy("_v").collect()
        lo_v, hi_v = straddle[0]._v, straddle[-1]._v
    return (lo_v + hi_v) / 2


def grouped_median_two_phase(
    df: DataFrame,
    value: Column,
    group_by: list[str],
    *,
    buckets: int = 4096,
    final_cap: int = 1_000_000,
    stats: DataFrame | None = None,
) -> DataFrame:
    """``median_two_phase`` generalized per group, every phase itself
    distributed — no per-group driver work, so it holds for BOTH axes
    of scale (many groups AND one huge skewed group):

    1. one grouped agg for per-group (count, min, max) → a per-group
       state frame carrying the candidate range and the 1-indexed
       middle ranks (k1, k2) — or, via ``stats=``, a caller-supplied
       frame with (group..., count, min, max) columns so a caller that
       already aggregated (``agg_table``) pays no extra scan;
    2. while ANY group still has more than ``final_cap`` candidates
       (the driver checks one boolean per round; rounds are
       log_buckets-bounded — 1e12-row groups need 2): bucket the
       active groups' candidate values ((group, bucket) hash-agg,
       map-side combinable), take a per-group cumulative count with
       one window over the <= ``buckets``-row-per-group histogram,
       and derive the straddling bucket span, rank offsets, and new
       range in ONE agg — the same stall guard as the ungrouped
       version freezes groups whose tie runs stop shrinking;
    3. final per-group rank selection: candidates re-scoped by each
       group's final range, ``row_number`` over (group, value) picks
       the middle rank(s), one avg merges them.  The window's sort is
       external/spillable and its input is ``final_cap``-bounded per
       group, so — unlike ``percentile()``'s in-memory buffer, the
       construct this replaces — a skewed group cannot OOM an
       executor.

    Returns one (group_by..., median double) row per group with a
    non-null value; interpolation convention matches ``percentile``
    and DuckDB's ``median`` (mean of the two middle values).
    """
    gb = list(group_by)
    # NOT checkpointed: each round re-scans the (group, value)
    # projection — the reference's protocol is also scan-per-phase,
    # and pinning a corpus-sized projection in the block manager
    # would trade the OOM this function removes for another
    vals = df.select(*gb, value.alias("_v")).filter(F.col("_v").isNotNull())
    dv = F.col("_v").cast("double")
    if stats is not None:
        # caller already aggregated per-group (count, min, max) — e.g.
        # agg_table's endpoint frame — so phase 1 costs nothing extra.
        # Cast-to-double is monotone, so double(min(v)) == min(double(v)).
        st = stats.filter(F.col("count") > 0).select(
            *gb,
            F.col("count").alias("_cn"),
            F.col("min").cast("double").alias("_lo"),
            F.col("max").cast("double").alias("_hi"),
        )
    else:
        st = vals.groupBy(*gb).agg(
            F.count("*").alias("_cn"),
            F.min(dv).alias("_lo"),
            F.max(dv).alias("_hi"),
        )
    st = (
        st.select(
            *gb, "_cn", "_lo", "_hi",
            F.expr("(_cn + 1) div 2").alias("_k1"),
            F.expr("(_cn + 2) div 2").alias("_k2"),
            F.lit(0).alias("_stall"),
        )
        # lazy: the loop's isEmpty() check is the first action anyway,
        # so the materialization folds into it instead of costing a
        # separate job at construction (r10; eager was the default)
        .localCheckpoint(eager=False)
    )
    active = (
        (F.col("_cn") > final_cap)
        & (F.col("_hi") > F.col("_lo"))
        & (F.col("_stall") < 2)
        # double-precision underflow: all-but-tied values
        & ((F.col("_hi") - F.col("_lo")) / buckets > 0.0)
    )
    while not st.filter(active).isEmpty():
        act = st.filter(active).withColumn(
            "_w", (F.col("_hi") - F.col("_lo")) / buckets
        )
        j = vals.join(act, gb).filter(dv.between(F.col("_lo"), F.col("_hi")))
        bidx = F.least(
            F.floor((dv - F.col("_lo")) / F.col("_w")), F.lit(buckets - 1)
        ).cast("int")
        # state cols are functionally dependent on the group keys, so
        # grouping by them just carries the state through the agg
        carry = [*gb, "_cn", "_lo", "_hi", "_k1", "_k2", "_stall", "_w"]
        hist = j.groupBy(*carry, bidx.alias("_b")).agg(
            F.count("*").alias("_c"),
            # ACTUAL per-bucket value extrema — the new range is taken
            # from these, never rebuilt as lo + b*w, because the
            # reconstructed edge can disagree with floor((v-lo)/w) by
            # one ulp and silently drop a rank-counted value.  Bucket
            # index is monotone in value, so [min of b1, max of b2]
            # selects exactly the straddling span.
            F.min(dv).alias("_bmin"),
            F.max(dv).alias("_bmax"),
        )
        cum = F.sum("_c").over(Window.partitionBy(*gb).orderBy("_b"))
        hw = hist.withColumn("_cum", cum)
        # _cum is monotone in _b, so: rows below the k1-straddling
        # bucket are exactly those with _cum < k1 (their max _cum is
        # the rank offset), min-over-when picks each straddler, and
        # "bucket <= b2" is exactly "_cum - _c < _k2"
        s = hw.groupBy(*carry).agg(
            F.coalesce(
                F.max(F.when(F.col("_cum") < F.col("_k1"), F.col("_cum"))),
                F.lit(0),
            ).alias("_below"),
            F.min(
                F.when(F.col("_cum") >= F.col("_k1"), F.col("_bmin"))
            ).alias("_lo2"),
            F.max(
                F.when(F.col("_cum") - F.col("_c") < F.col("_k2"),
                       F.col("_bmax"))
            ).alias("_hi2"),
            F.min(
                F.when(F.col("_cum") >= F.col("_k2"), F.col("_cum"))
            ).alias("_cum2"),
        )
        advanced = s.select(
            *gb,
            (F.col("_cum2") - F.col("_below")).alias("_cn_new"),
            F.col("_lo2").alias("_lo_new"),
            F.col("_hi2").alias("_hi_new"),
            (F.col("_k1") - F.col("_below")).alias("_k1_new"),
            (F.col("_k2") - F.col("_below")).alias("_k2_new"),
            F.when(F.col("_cum2") - F.col("_below") >= F.col("_cn"),
                   F.col("_stall") + 1)
            .otherwise(F.lit(0))
            .alias("_stall_new"),
        ).select(
            *gb,
            F.col("_cn_new").alias("_cn"),
            F.col("_lo_new").alias("_lo"),
            F.col("_hi_new").alias("_hi"),
            F.col("_k1_new").alias("_k1"),
            F.col("_k2_new").alias("_k2"),
            F.col("_stall_new").alias("_stall"),
        )
        st = (
            st.filter(~active)
            .unionByName(advanced)
            # lazy; next round's isEmpty() materializes it (see above)
            .localCheckpoint(eager=False)
        )
    # final: per-group middle ranks over the narrowed candidates.  The
    # carried (lo, hi) are actual candidate values (per-bucket extrema,
    # not reconstructed edges), so the between() re-scope reproduces
    # the counted bucket span exactly and the ranks line up.
    #
    # Rank selection runs over DISTINCT values (r10: the r8 ungrouped
    # tie-run pattern generalized per group): candidates collapse to a
    # (group, value, count) hash-agg — map-side combinable, every core
    # participates — and ONE window over the per-group distinct-value
    # histogram computes cumulative mass; the value at rank k is the
    # first value whose cumulative count reaches k, and the median
    # averages the k1/k2 picks exactly like the row form ((v+v)/2 == v
    # in IEEE for the odd case).  The former row_number form sorted
    # every candidate ROW in one window task per group — the per-group
    # parallelism bottleneck now only ever sees the distinct values
    # (worst case it degenerates to the same final_cap bound).
    cand = vals.join(st, gb).filter(dv.between(F.col("_lo"), F.col("_hi")))
    wcand = cand.groupBy(*gb, "_k1", "_k2", "_v").agg(
        F.count("*").alias("_c")
    )
    hw = wcand.withColumn(
        "_cum", F.sum("_c").over(Window.partitionBy(*gb).orderBy("_v"))
    )
    return hw.groupBy(*gb).agg(
        (
            (
                F.min(F.when(F.col("_cum") >= F.col("_k1"), dv))
                + F.min(F.when(F.col("_cum") >= F.col("_k2"), dv))
            )
            / 2
        ).alias("median")
    )


def row_count(visible: DataFrame) -> int:
    """AggregationClient.rowCount (AggregationClient.java:350) /
    RowCounter (mr/RowCounter.java:60): distinct row keys.  The
    reference injects FirstKeyOnlyFilter to avoid materializing values;
    count(distinct row) gives Catalyst the same shortcut via a
    partial-agg over the single pruned column."""
    return visible.select("row").distinct().count()


def median_mass_midpoint(
    df: DataFrame,
    value: Column,
    weight: Column,
    order: Column,
    *,
    prefix_len: int = 3,
) -> object:
    """The reference's ACTUAL median protocol, including the weighted
    form (AggregationClient.java:796-869, AggregateImplementation.java
    :483-539): walk rows in ROW-KEY order accumulating the weight
    column (the value column itself when no weight is given) and
    return the value of the last row BEFORE the running sum exceeds
    half the total — the mass midpoint of the keyspace.  For keyed
    data this answers "which value sits at the point splitting the
    (weighted) mass in half, in key order" — e.g. the reading at the
    time splitting a day's traffic in half.  (`agg_table`'s `median`
    is the statistical median of values; this is the reference's
    key-ordered semantics, kept as its own operator because the two
    answer different questions.)

    Faithfully two-phase and scale-safe: phase 1 buckets rows by an
    order-preserving key prefix (the region analog — lexicographic,
    so bucket order IS key order) and collects only per-bucket weight
    sums (<= alphabet^prefix_len rows); the driver walks buckets to
    find the one straddling the half mass, exactly like the
    reference's per-region first scan; phase 2 sorts WITHIN the
    straddling bucket only (one bounded partition) and walks it with
    a cumulative-sum window.  No full-table sort, no unbounded
    collect.

    Choose ``prefix_len`` so the prefixes actually split the keyspace
    (padded numeric keys: the first digits that vary); if every key
    shares the prefix the algorithm stays correct but phase 2
    degenerates to a single sorted partition of the whole input.
    """
    rows = df.select(
        order.cast("string").alias("_k"),
        value.alias("_v"),
        weight.cast("double").alias("_w"),
    )
    bucketed = rows.withColumn("_b", F.substring("_k", 1, prefix_len))
    sums = bucketed.groupBy("_b").agg(F.sum("_w").alias("_s")).collect()
    if not sums:
        return None
    total = sum(r["_s"] for r in sums)
    half = total / 2.0
    moving = 0.0
    straddle = None
    for r in sorted(sums, key=lambda r: r["_b"]):
        if moving + r["_s"] > half:
            straddle = r["_b"]
            break
        moving += r["_s"]
    if straddle is None:  # all mass <= half (degenerate): last bucket
        straddle = max(r["_b"] for r in sums)
    w = Window.orderBy("_k").rowsBetween(Window.unboundedPreceding, 0)
    in_bucket = (
        bucketed.filter(F.col("_b") == straddle)
        .withColumn("_cum", F.sum("_w").over(w) + F.lit(moving))
        # value of the last row BEFORE the cumulative sum crosses half:
        # rows with running sum <= half are "before"; take the last one
        .filter(F.col("_cum") <= F.lit(half))
        .orderBy(F.col("_k").desc())
        .limit(1)
        .collect()
    )
    if not in_bucket:
        # the straddling bucket's FIRST row crosses half: the reference
        # returns the value accumulated so far, i.e. the previous
        # bucket's last row (None when the very first row crosses)
        prev = (
            bucketed.filter(F.col("_b") < straddle)
            .orderBy(F.col("_k").desc())
            .limit(1)
            .collect()
        )
        return prev[0]["_v"] if prev else None
    return in_bucket[0]["_v"]


def agg_median_weighted(
    visible: DataFrame,
    family: str,
    qualifier,
    weight_qualifier,
    *,
    interpreter: str = "long",
    prefix_len: int = 3,
):
    """AggregationClient.median with the optional weight column
    (AggregationClient.java:808-811 `weighted = true`): value and
    weight live in two qualifiers of the same family, matched by row.
    """
    v = visible.filter(
        (F.col("family") == family) & (F.col("qualifier") == qualifier)
    ).select("row", _typed("value", interpreter).alias("_val"))
    wq = visible.filter(
        (F.col("family") == family) & (F.col("qualifier") == weight_qualifier)
    ).select("row", _typed("value", interpreter).alias("_wgt"))
    joined = v.join(wq, "row")
    return median_mass_midpoint(
        joined, F.col("_val"), F.col("_wgt"), F.col("row"),
        prefix_len=prefix_len,
    )
