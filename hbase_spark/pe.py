"""PerformanceEvaluation (PE) analog — the reference's de-facto
community benchmark harness, re-expressed Spark-first.

Reference: hbase-diagnostics/src/main/java/org/apache/hadoop/hbase/
PerformanceEvaluation.java (3,101 LoC; workload registry :166-209,
defaults :145-153).  BASELINE.md documents the workload definitions and
the engine-side mapping this module implements; this file makes that
mapping RUNNABLE, so a user of the reference who drives PE today can
drive the same command surface here.

Semantics translation (PE is an OLTP client-loop harness; this engine
is batch-analytic):

- PE runs N client threads/maps, each looping ``perClientRunRows`` times
  over single-row RPCs and reporting per-op latency.  Here each workload
  is ONE distributed DataFrame job over the same row population, and the
  report is bulk throughput (rows/s) — the "engine-side analog
  workloads" table in BASELINE.md.  ``nclients`` maps to write
  parallelism (generation partitions and flush regions), the analog of
  PE's presplit ``--presplit``/client count.
- Keys: 26-byte zero-padded decimals (``format``,
  PerformanceEvaluation.java:2596-2604; ROW_LENGTH :150).
- Values: PE's ``generateData`` (:2611-2632) emits runs of 8 identical
  random letters so values compress realistically.  The analog keeps the
  8-byte-run shape but derives the letters DETERMINISTICALLY from the
  row key (md5 chains mapped onto a 16-letter alphabet), so every
  workload — and the pytest oracle — can recompute any cell's expected
  value.  PE's alphabet has 26 letters and is random per call; the
  entropy difference is irrelevant to the measured paths.
- Table: ``TestTable`` with families ``info0..info{F-1}``
  (TABLE_NAME :145, FAMILY_NAME_BASE :146), ``--columns`` qualifiers
  ``0..C-1`` (COLUMN_ZERO :148).
- CAS workloads (increment/append/checkAnd*) use the workload's class
  name as qualifier, like CASTableTest (:2228-2249).  The checkAnd*
  guard deviates in one documented way: PE guards each row on its own
  key bytes (ifEquals(bytes) :2313-2351); the engine's CheckAndMutate
  guard compares against ONE comparator value per batch (like the
  public CheckAndMutate builder), so the harness first puts a constant
  sentinel and guards on it — same 100% pass rate, same
  read-check-mutate path.

Every workload reports one JSON line:
``{"workload": ..., "rows": N, "sec": s, "rows_per_sec": r, ...}``.

Scale posture: generation is ``spark.range`` (no driver lists), writes
are single bulk merges through ``Admin.flush`` (range-partitioned
regions), reads are scans/semi-joins that prune through the same
layout any query uses.  Nothing here collects unbounded results — the
per-range workloads count rows on the executors and return scalars.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_spark.admin import Admin
from hbase_spark.filters.comparators import BinaryComparator
from hbase_spark.filters.filters import FilterList, SingleColumnValueFilter
from hbase_spark.model import CellType
from hbase_spark.operators.scan import Scan

# PerformanceEvaluation.java:145-153
TABLE_NAME = "TestTable"
FAMILY_NAME_BASE = "info"
COLUMN_ZERO = "0"
DEFAULT_VALUE_LENGTH = 1000
ROW_LENGTH = 26
ONE_GB = 1024 * 1024 * 1000
DEFAULT_ROWS_PER_GB = ONE_GB // DEFAULT_VALUE_LENGTH  # :153

# generateData letter alphabet for the deterministic analog: md5 hex
# digits map 1:1 onto 16 capital letters (PE uses 26 random ones)
_HEX = "0123456789abcdef"
_LETTERS = "ABCDEFGHIJKLMNOP"


def pe_format(col):
    """``format(long)`` — 26-byte zero-padded decimal key
    (PerformanceEvaluation.java:2596)."""
    return F.lpad(col.cast("string"), ROW_LENGTH, "0")


def pe_value(key_col, value_size: int, salt: str = ""):
    """``generateData`` analog (PerformanceEvaluation.java:2611): runs
    of 8 identical letters, deterministic in (key, salt).

    One md5 per 32 blocks (256 value bytes), one regexp pass to expand
    each letter to its 8-byte run — all JVM-side, no Python UDF."""
    n_blocks = (value_size + 7) // 8
    n_hashes = (n_blocks + 31) // 32
    chains = [
        F.md5(F.concat(key_col.cast("string"), F.lit(f"{salt}#{i}")))
        for i in range(n_hashes)
    ]
    letters = F.translate(F.concat(*chains), _HEX, _LETTERS)
    runs = F.regexp_replace(letters, "(.)", "$1" * 8)
    return F.substring(runs, 1, value_size)


def pe_value_py(key: str, value_size: int, salt: str = "") -> str:
    """Driver/pytest twin of :func:`pe_value` (hashlib instead of
    Catalyst) — the oracle for value-content assertions."""
    import hashlib

    n_blocks = (value_size + 7) // 8
    n_hashes = (n_blocks + 31) // 32
    hexs = "".join(
        hashlib.md5(f"{key}{salt}#{i}".encode()).hexdigest()
        for i in range(n_hashes)
    )
    table = str.maketrans(_HEX, _LETTERS)
    return "".join(c * 8 for c in hexs.translate(table))[:value_size]


@dataclass
class PEOptions:
    """The subset of PE's TestOptions (:240) that maps onto the batch
    analog; defaults match the reference's."""

    rows: int = DEFAULT_ROWS_PER_GB          # perClientRunRows :152
    total_rows: int | None = None            # random-key space; default rows
    value_size: int = DEFAULT_VALUE_LENGTH   # --valueSize :149
    families: int = 1                        # --families :474
    columns: int = 1                         # --columns
    nclients: int = 1                        # client/presplit parallelism
    queries: int = 32                        # per-op workloads: ops per run
    seed: int = 42                           # determinism (PE uses TLR)
    table: str = TABLE_NAME

    def __post_init__(self):
        if self.total_rows is None:
            self.total_rows = self.rows

    @property
    def family_names(self) -> list[str]:
        return [f"{FAMILY_NAME_BASE}{i}" for i in range(self.families)]

    @property
    def qualifier_names(self) -> list[str]:
        return [str(c) for c in range(self.columns)]


class PerformanceEvaluation:
    """Drives PE's registered workloads against a catalog-backed table.

    Read workloads require populated data; ``ensure_loaded()`` runs an
    UNTIMED sequentialWrite when the table is missing/empty (PE itself
    assumes a prior write run)."""

    def __init__(self, spark: SparkSession, catalog_dir: str,
                 opts: PEOptions | None = None):
        self.spark = spark
        self.opts = opts or PEOptions()
        self.admin = Admin(spark, catalog_dir)
        self._loaded = False
        # monotonic mutation clock: PE stamps server-now per op; a fixed
        # ts would make a re-run write a conflicting cell at identical
        # (ts, seq) coordinates
        self._op_ts = 1

    def _next_ts(self) -> int:
        self._op_ts += 1
        return self._op_ts

    # ---------------------------------------------------------- setup

    def init_create_table(self) -> None:
        """initCreateTable analog: (re)create TestTable with the
        requested families (PerformanceEvaluation.java:474)."""
        o = self.opts
        if o.table in self.admin.list_enabled_tables():
            self.admin.disable_table(o.table)
            self.admin.delete_table(o.table)
        self.admin.create_table(o.table, o.family_names)
        self._loaded = False
        self._op_ts = 1

    def ensure_loaded(self) -> None:
        if self._loaded:
            return
        if self.opts.table not in self.admin.list_enabled_tables():
            self.init_create_table()
        cells = self.admin.table(self.opts.table).cells
        if cells.isEmpty():
            self.sequential_write()
        else:
            # adopt an existing population (e.g. a prior process's run):
            # advance the mutation clock past everything already written
            top = cells.agg(F.max("ts")).first()[0]
            self._op_ts = max(self._op_ts, int(top or 1))
        self._loaded = True

    # ------------------------------------------------------ generators

    def _keys(self, sequential: bool) -> DataFrame:
        """The row population: ids 0..rows-1, sequential keys or random
        draws over [0, total_rows) (getRandomRow :2634 — uniform with
        collisions, later write wins)."""
        o = self.opts
        ids = self.spark.range(o.rows, numPartitions=o.nclients)
        if sequential:
            idx = F.col("id")
        else:
            idx = F.pmod(F.xxhash64("id", F.lit(o.seed)), F.lit(o.total_rows))
        return ids.select(pe_format(idx).alias("row"))

    def _put_frame(self, keys: DataFrame, ts: int, seq: int) -> DataFrame:
        """Melt keys × families × columns into PUT cells with
        deterministic generateData values (SequentialWriteTest :2408:
        one put per row carrying every family × column)."""
        o = self.opts
        fams = F.explode(F.array(*[F.lit(f) for f in o.family_names]))
        quals = F.explode(F.array(*[F.lit(q) for q in o.qualifier_names]))
        return (
            keys.select("row", fams.alias("family"))
            .select("row", "family", quals.alias("qualifier"))
            .select(
                "row", "family", "qualifier",
                F.lit(ts).cast("long").alias("ts"),
                F.lit(int(CellType.PUT)).cast("int").alias("type"),
                # a distinct value per (row, family, qualifier), like
                # PE's per-column generateData call
                pe_value(
                    F.concat_ws("|", "row", "family", "qualifier"),
                    o.value_size,
                ).alias("value"),
                F.lit(seq).cast("long").alias("seq"),
            )
        )

    def _flush(self, table) -> None:
        self.admin.flush(self.opts.table, table,
                         num_regions=max(self.opts.nclients, 1))

    def _rand_starts(self, n: int, lo_exclusive_max: int | None = None):
        """Deterministic uniform start indices for the per-op scan
        workloads (generateRandomRow :2638)."""
        import hashlib

        space = lo_exclusive_max or self.opts.total_rows
        out = []
        for i in range(n):
            h = hashlib.md5(f"{self.opts.seed}:{i}".encode()).hexdigest()
            out.append(int(h, 16) % space)
        return out

    # ------------------------------------------------------- workloads
    # each returns (ops_done, details) — the runner times it

    def sequential_write(self):
        """SequentialWriteTest :2408 — write every row in key order as
        one bulk merge + flush (cells/s is rows × families × columns)."""
        self.init_create_table()
        cells = self._put_frame(self._keys(sequential=True), ts=1, seq=0)
        t = self.admin.table(self.opts.table).with_cells(cells)
        self._flush(t)
        self._loaded = True
        o = self.opts
        return o.rows * o.families * o.columns, {"cells_per_row": o.families * o.columns}

    def random_write(self):
        """RandomWriteTest :2110 — same write path, uniform-random keys
        (collisions resolve newest-wins, like re-puts)."""
        self.init_create_table()
        cells = self._put_frame(self._keys(sequential=False), ts=1, seq=0)
        t = self.admin.table(self.opts.table).with_cells(cells)
        self._flush(t)
        self._loaded = True
        o = self.opts
        return o.rows * o.families * o.columns, {}

    def _scan_bytes(self, scan: Scan | None = None) -> tuple:
        """Run a scan and reduce to (rows, value bytes) on the
        executors — PE's updateValueSize accounting (:1528)."""
        df = self.admin.table(self.opts.table).scan(scan or Scan())
        r = df.agg(
            F.countDistinct("row").alias("rows"),
            F.sum(F.length("value")).alias("bytes"),
        ).first()
        return int(r["rows"] or 0), int(r["bytes"] or 0)

    def sequential_read(self):
        """SequentialReadTest :2381 — read every row in key order.
        Batch analog: full snapshot resolve + value-size reduction."""
        self.ensure_loaded()
        rows, nbytes = self._scan_bytes()
        return rows, {"value_bytes": nbytes}

    def random_read(self):
        """RandomReadTest :1993 — K uniform-random single-row gets →
        ONE multi-get semi-join (In(row) pushdown)."""
        self.ensure_loaded()
        keys = [f"{i:026d}" for i in self._rand_starts(
            min(self.opts.rows, 10_000))]
        got = self.admin.table(self.opts.table).multi_get(keys)
        rows = got.select("row").distinct().count()
        return len(keys), {"rows_found": rows}

    def scan(self):
        """ScanTest :2134 — full-table scan."""
        self.ensure_loaded()
        rows, nbytes = self._scan_bytes()
        return rows, {"value_bytes": nbytes}

    def reverse_scan(self):
        """ReverseScanTest :2177 — descending full scan."""
        self.ensure_loaded()
        rows, nbytes = self._scan_bytes(Scan(reversed=True))
        return rows, {"value_bytes": nbytes}

    def _scan_range(self, max_range: int):
        """RandomScanWithRangeTest :1888 — Q random ranges of
        [start, start+N) formatted keys; reports rows/s over the batch
        plus queries/s (PE reports per-op latency)."""
        self.ensure_loaded()
        q = self.opts.queries
        total = 0
        for start in self._rand_starts(q):
            s = Scan(start_row=f"{start:026d}",
                     stop_row=f"{start + max_range:026d}")
            total += self.admin.table(self.opts.table).scan(s) \
                .select("row").distinct().count()
        return total, {"queries": q, "max_range": max_range}

    def scan_range10(self):
        return self._scan_range(10)

    def scan_range100(self):
        return self._scan_range(100)

    def scan_range1000(self):
        return self._scan_range(1000)

    def scan_range10000(self):
        return self._scan_range(10000)

    def random_seek_scan(self):
        """RandomSeekScanTest :1841 — seek to a random row, then
        WhileMatch(PageFilter(120)): scan the next 120 rows.  The
        take-while-first-120-rows composite is exactly Scan.limit
        semantics here (PageFilter's global-LIMIT translation,
        filters.py), so the harness sets ``limit=120`` directly —
        same rows, one less filter stage."""
        self.ensure_loaded()
        q = self.opts.queries
        total = 0
        for start in self._rand_starts(q):
            s = Scan(start_row=f"{start:026d}", limit=120)
            total += self.admin.table(self.opts.table).scan(s) \
                .select("row").distinct().count()
        return total, {"queries": q}

    def filter_scan(self):
        """FilteredScanTest :2522 — full scan under
        SingleColumnValueFilter(info0, "0", EQUAL, value).  PE draws a
        random value (match ≈ never); the deterministic analog targets
        a real row's value so the filter provably selects it."""
        self.ensure_loaded()
        target_idx = self._rand_starts(1)[0] % self.opts.rows
        key = f"{target_idx:026d}"
        target = pe_value_py(
            f"{key}|{FAMILY_NAME_BASE}0|{COLUMN_ZERO}", self.opts.value_size)
        flt = FilterList("MUST_PASS_ALL", [SingleColumnValueFilter(
            f"{FAMILY_NAME_BASE}0", COLUMN_ZERO, "=",
            BinaryComparator(target), filter_if_missing=True)])
        rows, nbytes = self._scan_bytes(Scan(filter=flt))
        # throughput basis = rows the scan evaluated (the whole table),
        # like PE's full-scan-per-op accounting
        return self.opts.rows, {"rows_matched": rows, "value_bytes": nbytes}

    def _cas_qualifier(self, name: str) -> str:
        # CASTableTest uses the test's class name as qualifier :2233
        return name

    def increment(self):
        """IncrementTest :2251 — +1 on every row × family under the
        'IncrementTest' qualifier; one delta-merge + flush."""
        self.ensure_loaded()
        o = self.opts
        fams = F.explode(F.array(*[F.lit(f) for f in o.family_names]))
        deltas = self._keys(sequential=True).select(
            "row", fams.alias("family"),
            F.lit(self._cas_qualifier("IncrementTest")).alias("qualifier"),
            F.lit(1).cast("long").alias("delta"),
        )
        ts = self._next_ts()
        t = self.admin.table(o.table).increment(deltas, ts=ts, seq=ts)
        self._flush(t)
        return o.rows * o.families, {}

    def append(self):
        """AppendTest :2271 — append the row key to the 'AppendTest'
        qualifier on every row × family."""
        self.ensure_loaded()
        o = self.opts
        fams = F.explode(F.array(*[F.lit(f) for f in o.family_names]))
        appends = self._keys(sequential=True).select(
            "row", fams.alias("family"),
            F.lit(self._cas_qualifier("AppendTest")).alias("qualifier"),
            F.col("row").alias("delta"),
            F.lit(1).cast("long").alias("seq"),
        )
        ts = self._next_ts()
        t = self.admin.table(o.table).append(appends, ts=ts, seq=ts)
        self._flush(t)
        return o.rows * o.families, {}

    def _check_and(self, kind: str):
        """checkAndPut/Delete/Mutate :2292-2351 — put a known sentinel,
        then a guarded mutation batch over the same rows (guard compares
        the sentinel; see module docstring for the one deviation)."""
        self.ensure_loaded()
        o = self.opts
        qual = self._cas_qualifier(f"CheckAnd{kind}Test")
        fam = f"{FAMILY_NAME_BASE}0"
        sentinel = "S"
        keys = self._keys(sequential=True)
        ts_known, ts_mut = self._next_ts(), self._next_ts()
        known = keys.select(
            "row", F.lit(fam).alias("family"), F.lit(qual).alias("qualifier"),
            F.lit(ts_known).cast("long").alias("ts"),
            F.lit(int(CellType.PUT)).cast("int").alias("type"),
            F.lit(sentinel).alias("value"),
            F.lit(ts_known).cast("long").alias("seq"),
        )
        t = self.admin.table(o.table).with_cells(known)
        if kind == "Delete":
            mut_type, mut_value = int(CellType.DELETE_COLUMN), None
        else:
            mut_type, mut_value = int(CellType.PUT), "T"
        muts = keys.select(
            "row", F.lit(fam).alias("family"), F.lit(qual).alias("qualifier"),
            F.lit(ts_mut).cast("long").alias("ts"),
            F.lit(mut_type).cast("int").alias("type"),
            F.lit(mut_value).cast("string").alias("value"),
            F.lit(ts_mut).cast("long").alias("seq"),
        )
        t = t.check_and_mutate(
            muts, guard_family=fam, guard_qualifier=qual,
            op="=", comparator=BinaryComparator(sentinel),
        )
        self._flush(t)
        return o.rows, {"qualifier": qual}

    def check_and_put(self):
        return self._check_and("Put")

    def check_and_delete(self):
        return self._check_and("Delete")

    def check_and_mutate(self):
        return self._check_and("Mutate")

    def meta_random_read(self):
        """MetaRandomReadTest :2073 — K region-location lookups against
        the catalog (pure metadata: bounded, no scan)."""
        self.ensure_loaded()
        k = min(self.opts.queries * 4, 1000)
        found = 0
        for start in self._rand_starts(k):
            loc = self.admin.locate_region(self.opts.table, f"{start:026d}")
            found += 1 if loc else 0
        return k, {"located": found}

    # --------------------------------------------------------- running

    COMMANDS = {
        # name as registered in PE (addCommandDescriptor :166-209);
        # dict order is run_all's order — sequentialWrite populates,
        # reads and CAS run against that population, randomWrite goes
        # last because it rebuilds the table with a random key draw
        "sequentialWrite": "sequential_write",
        "sequentialRead": "sequential_read",
        "randomRead": "random_read",
        "scan": "scan",
        "reverseScan": "reverse_scan",
        "scanRange10": "scan_range10",
        "scanRange100": "scan_range100",
        "scanRange1000": "scan_range1000",
        "scanRange10000": "scan_range10000",
        "randomSeekScan": "random_seek_scan",
        "filterScan": "filter_scan",
        "increment": "increment",
        "append": "append",
        "checkAndPut": "check_and_put",
        "checkAndDelete": "check_and_delete",
        "checkAndMutate": "check_and_mutate",
        "metaRandomRead": "meta_random_read",
        "randomWrite": "random_write",
    }

    def run(self, command: str) -> dict:
        if command not in self.COMMANDS:
            raise ValueError(
                f"unknown PE command {command!r}; one of {sorted(self.COMMANDS)}")
        fn = getattr(self, self.COMMANDS[command])
        if command not in ("sequentialWrite", "randomWrite"):
            # population is setup, not workload: a standalone read
            # command must not time the write that seeds the table
            self.ensure_loaded()
        t0 = time.perf_counter()
        ops, details = fn()
        sec = time.perf_counter() - t0
        out = {
            "workload": command,
            "rows": ops,
            "sec": round(sec, 3),
            "rows_per_sec": round(ops / sec, 1) if sec > 0 else None,
            "clients": self.opts.nclients,
        }
        out.update(details)
        return out

    def run_all(self, commands: list[str] | None = None) -> list[dict]:
        return [self.run(c) for c in (commands or list(self.COMMANDS))]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        description="PerformanceEvaluation analog (see BASELINE.md)")
    p.add_argument("command",
                   help="PE workload name, comma-separated list, or 'all'")
    p.add_argument("nclients", nargs="?", type=int, default=4,
                   help="write parallelism (PE's client count)")
    p.add_argument("--rows", type=int, default=100_000,
                   help="rows per run (PE default 1,048,576 ≈ 1 GB)")
    p.add_argument("--valueSize", type=int, default=DEFAULT_VALUE_LENGTH)
    p.add_argument("--families", type=int, default=1)
    p.add_argument("--columns", type=int, default=1)
    p.add_argument("--queries", type=int, default=32,
                   help="ops per per-op workload (scanRangeN/seek/meta)")
    p.add_argument("--table", default=TABLE_NAME)
    p.add_argument("--catalog", default=None,
                   help="catalog dir (default: fresh temp dir)")
    a = p.parse_args(argv)

    spark = (
        SparkSession.builder.master("local[*]")
        .appName("hbase_spark-pe")
        .config("spark.sql.shuffle.partitions", str(max(a.nclients * 4, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # PE's default run materializes ~1 GB of generated cells in one
        # local JVM; Spark's 1g driver default thrashes GC there
        .config("spark.driver.memory", "16g")
        .config("spark.driver.maxResultSize", "2g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = a.catalog or tempfile.mkdtemp(prefix="hbase_spark_pe_")
    opts = PEOptions(rows=a.rows, value_size=a.valueSize,
                     families=a.families, columns=a.columns,
                     nclients=a.nclients, queries=a.queries, table=a.table)
    pe = PerformanceEvaluation(spark, catalog, opts)
    cmds = list(pe.COMMANDS) if a.command == "all" else a.command.split(",")
    for c in cmds:
        print(json.dumps(pe.run(c)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
