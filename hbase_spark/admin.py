"""Admin — table lifecycle over a directory catalog
(client/Admin.java surface: createTable/disableTable/deleteTable/
listTableNames/getDescriptor, re-expressed for a storage-backed engine).

A "table" is a bulk layout directory plus a descriptor JSON recording
the per-family schema knobs (the ColumnFamilyDescriptor analog).
Enable/disable is a descriptor flag — reads of a disabled table raise,
like the reference's TableNotEnabledException.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from hbase_spark.model import cell_schema
from hbase_spark.sources.layout import read_table, write_table
from hbase_spark.table import FamilyDescriptor, Table

_DESCRIPTOR = "table-descriptor.json"


class TableNotEnabledError(RuntimeError):
    pass


class Admin:
    def __init__(self, spark: SparkSession, catalog_dir: str):
        self.spark = spark
        self.catalog_dir = catalog_dir

    # -- descriptor IO ------------------------------------------------------

    def _desc_path(self, name: str) -> str:
        return f"{self.catalog_dir}/{name}/{_DESCRIPTOR}"

    def _write_desc(self, name: str, desc: dict) -> None:
        self.spark.createDataFrame([(json.dumps(desc),)], "v string").coalesce(
            1
        ).write.mode("overwrite").text(self._desc_path(name))

    def _read_desc(self, name: str) -> dict:
        try:
            rows = self.spark.read.text(self._desc_path(name)).collect()
        except Exception as e:  # noqa: BLE001
            raise ValueError(f"table {name!r} does not exist") from e
        return json.loads("\n".join(r.value for r in rows))

    # -- Admin surface ------------------------------------------------------

    def create_table(
        self, name: str, families: dict[str, FamilyDescriptor] | list[str]
    ) -> None:
        """Admin.createTable — registers the descriptor and an empty layout."""
        if isinstance(families, list):
            families = {f: FamilyDescriptor() for f in families}
        desc = {
            "enabled": True,
            "families": {
                f: {
                    "max_versions": d.max_versions,
                    "min_versions": d.min_versions,
                    "ttl_ms": d.ttl_ms,
                    "new_version_behavior": d.new_version_behavior,
                    "keep_deleted_cells": d.keep_deleted_cells,
                }
                for f, d in families.items()
            },
        }
        empty = self.spark.createDataFrame([], schema=cell_schema())
        empty.write.mode("overwrite").parquet(f"{self.catalog_dir}/{name}/cells")
        self._write_desc(name, desc)

    def table(self, name: str, *, now: int | None = None) -> Table:
        """Open a table: layout + descriptor -> Table facade."""
        desc = self._read_desc(name)
        if not desc["enabled"]:
            raise TableNotEnabledError(name)
        fams = {
            f: FamilyDescriptor(**knobs) for f, knobs in desc["families"].items()
        }
        cells = read_table(self.spark, f"{self.catalog_dir}/{name}/cells")
        if fams:
            # only declared families are readable — a family dropped via
            # alter(method='delete') disappears immediately (its data is
            # physically removed on the next flush)
            from pyspark.sql import functions as F

            cells = cells.filter(F.col("family").isin(list(fams)))
        return Table(cells, fams, now)

    def flush(self, name: str, table: Table, *, num_regions: int = 32) -> None:
        """Persist a mutated Table back to the layout (memstore flush /
        major-compaction write analog)."""
        write_table(table.cells, f"{self.catalog_dir}/{name}/cells2",
                    num_regions=num_regions)
        # swap via rewrite: read back the new layout and overwrite the
        # canonical path (two-step because Spark can't overwrite its input)
        fresh = read_table(self.spark, f"{self.catalog_dir}/{name}/cells2")
        fresh.write.mode("overwrite").parquet(f"{self.catalog_dir}/{name}/cells")

    def disable_table(self, name: str) -> None:
        desc = self._read_desc(name)
        desc["enabled"] = False
        self._write_desc(name, desc)

    def enable_table(self, name: str) -> None:
        desc = self._read_desc(name)
        desc["enabled"] = True
        self._write_desc(name, desc)

    def delete_table(self, name: str) -> None:
        """Admin.deleteTable — requires disable first, like the reference."""
        desc = self._read_desc(name)
        if desc["enabled"]:
            raise RuntimeError(f"table {name!r} must be disabled before delete")
        # overwrite the descriptor with a tombstone marker; data dirs are
        # left for storage-level GC (no filesystem API dependency here)
        self._write_desc(name, {"enabled": False, "deleted": True, "families": {}})

    def alter(
        self,
        name: str,
        family: str,
        descriptor: FamilyDescriptor | None = None,
        *,
        method: str = "modify",
    ) -> None:
        """Admin.modifyTable / shell `alter` (shell/commands/alter.rb):
        add or modify a column family's schema knobs, or drop a family
        (method='delete').  Dropping a family drops its data on the
        next flush (here: immediately filtered from reads via the
        descriptor, physically on the next flush — the reference's
        store-directory removal timing)."""
        desc = self._read_desc(name)
        if method == "delete":
            if family not in desc["families"]:
                raise ValueError(f"family {family!r} not in table {name!r}")
            del desc["families"][family]
        else:
            d = descriptor or FamilyDescriptor()
            desc["families"][family] = {
                "max_versions": d.max_versions,
                "min_versions": d.min_versions,
                "ttl_ms": d.ttl_ms,
                "new_version_behavior": d.new_version_behavior,
                "keep_deleted_cells": d.keep_deleted_cells,
            }
        self._write_desc(name, desc)

    def truncate_table(self, name: str) -> None:
        """shell `truncate` (shell/commands/truncate.rb): drop all data,
        keep the schema."""
        desc = self._read_desc(name)
        empty = self.spark.createDataFrame([], schema=cell_schema())
        empty.write.mode("overwrite").parquet(f"{self.catalog_dir}/{name}/cells")
        self._write_desc(name, desc)

    def table_exists(self, name: str) -> bool:
        """Admin.tableExists / shell `exists`."""
        try:
            return not self._read_desc(name).get("deleted", False)
        except ValueError:
            return False

    def list_tables(self) -> list[str]:
        try:
            df = self.spark.read.text(f"{self.catalog_dir}/*/{_DESCRIPTOR}")
        except Exception:  # noqa: BLE001 — empty catalog
            return []
        import re

        names = set()
        for f in df.inputFiles():
            m = re.search(r"/([^/]+)/" + _DESCRIPTOR, f)
            if m:
                desc = self._read_desc(m.group(1))
                if not desc.get("deleted"):
                    names.add(m.group(1))
        return sorted(names)

    def describe(self, name: str) -> dict:
        return self._read_desc(name)
