"""Column mapping — Delta's ``ALTER TABLE ... RENAME COLUMN`` (and
DROP COLUMN) without rewriting a byte of data.

Parquet files name columns physically; renaming by rewrite costs a
full-table pass (at 100 TB, hours). Delta's column-mapping mode
instead records a logical→physical name map in the table metadata:
RENAME edits the map, DROP removes the entry, and readers project
physical columns to logical names at scan time. This module realizes
the same contract on a parquet directory: the map lives in a JSON
manifest beside the data (atomic tmp+rename updates), reads go
through ``read_mapped`` (a pure ``selectExpr`` projection — codegen'd,
zero overhead), and the data files are never touched — tests assert
byte-identical files across a rename.

Cite: delta-io column mapping (name mode); the reference's
PosDeltaScan assumes exactly this kind of metadata-managed table
(delta_node.rs:63-109).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_COLUMN_MAPPING.json"


class ColumnMappedTable:
    """A parquet directory plus a logical→physical column map."""

    def __init__(self, root: str):
        self.root = root

    @property
    def _manifest(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    @classmethod
    def create(cls, df: DataFrame, root: str) -> "ColumnMappedTable":
        """Write ``df`` once; the initial map is identity."""
        df.write.mode("errorifexists").parquet(root)
        t = cls(root)
        t._save({c: c for c in df.columns})
        return t

    def _load(self) -> dict[str, str]:
        with open(self._manifest, encoding="ascii") as fh:
            return json.load(fh)

    def _save(self, mapping: dict[str, str]) -> None:
        tmp = self._manifest + ".tmp"
        with open(tmp, "w", encoding="ascii") as fh:
            json.dump(mapping, fh)
        os.replace(tmp, self._manifest)

    def rename_column(self, old: str, new: str) -> None:
        """Metadata-only rename: no data file is opened, let alone
        rewritten."""
        m = self._load()
        if old not in m:
            raise ValueError(f"no logical column {old!r} (have {sorted(m)})")
        if new in m:
            raise ValueError(f"logical column {new!r} already exists")
        m[new] = m.pop(old)
        self._save(m)

    def drop_column(self, name: str) -> None:
        """Metadata-only drop: the physical column stays in the files
        (Delta's contract too — a later VACUUM-style rewrite may
        reclaim it) but disappears from every read."""
        m = self._load()
        if name not in m:
            raise ValueError(f"no logical column {name!r} (have {sorted(m)})")
        del m[name]
        self._save(m)

    def read(self, spark: SparkSession) -> DataFrame:
        """The table under its LOGICAL schema: one selectExpr
        projection over the physical scan — whole-stage-codegen'd,
        column-pruned (only mapped physical columns are read)."""
        m = self._load()
        return spark.read.parquet(self.root).selectExpr(
            *[f"`{phys}` AS `{log}`" for log, phys in m.items()]
        )
