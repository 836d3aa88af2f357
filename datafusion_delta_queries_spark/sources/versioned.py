"""Append-only versioned parquet tables: time travel + change feed.

Layout: one directory per committed version —

    <root>/v=00000000/*.parquet   (version 0's appended rows)
    <root>/v=00000001/*.parquet   (version 1's appended rows)
    ...

- ``snapshot(v)``   = union of version dirs <= v   (Delta ``versionAsOf``)
- ``changes(a, b)`` = union of version dirs in (a, b]  (CDF insert rows)

Both are plain multi-path parquet scans, so Catalyst still pushes
filters/pruning into them, and version selection is directory-level
partition pruning (no data files of excluded versions are opened). At
100 TB this is the poor-man's transaction log: real deployments swap
in Delta Lake (see ``delta_lake_table``) — the two read primitives and
everything above them (DeltaCatalog, compile_delta) are unchanged.

``VersionedDeltaCatalog`` plugs these reads into the delta compiler:
un-delta'd plan refs compile to ``snapshot(old)`` and PosDeltaScan
leaves to ``changes(old, new)`` — the honest versioned realization of
SURVEY §4.3 (vs. the predicate-split emulation used for the driver's
single-file fixtures).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..plans.compiler import DeltaCatalog
from ..plans.signed import SignedDeltaCatalog

_VDIR = re.compile(r"^v=(\d{8})$")


class VersionedTable:
    """An append-only table whose commits are parquet version dirs."""

    def __init__(self, root: str):
        self.root = root

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version:08d}")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            m = _VDIR.match(name)
            if m and os.path.isdir(os.path.join(self.root, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError(f"no committed versions under {self.root}")
        return vs[-1]

    def write_version(self, df: DataFrame, version: int | None = None) -> int:
        """Commit ``df``'s rows as the next (or given) version."""
        vs = self.versions()
        if version is None:
            version = (vs[-1] + 1) if vs else 0
        if version in vs:
            raise ValueError(f"version {version} already committed")
        df.write.mode("errorifexists").parquet(self._version_dir(version))
        return version

    def _read(self, spark: SparkSession, versions: list[int]) -> DataFrame:
        paths = [self._version_dir(v) for v in versions]
        if not paths:
            raise ValueError(f"no versions selected from {self.root}")
        # mergeSchema: a later commit may ADD columns (additive schema
        # evolution, the lakehouse norm); without it the scan would pick
        # one file's schema and silently drop the others' extra columns.
        # Earlier versions' rows surface NULL for columns they predate.
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def snapshot(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Time travel: table state as of ``version`` (default latest)."""
        if version is None:
            version = self.latest_version()
        return self._read(spark, [v for v in self.versions() if v <= version])

    def changes(self, spark: SparkSession, from_v: int, to_v: int) -> DataFrame:
        """Insert-only change feed: rows appended in (from_v, to_v]."""
        return self._read(
            spark, [v for v in self.versions() if from_v < v <= to_v]
        )


def delta_lake_table(spark: SparkSession, path: str):
    """Real Delta Lake handle when delta-spark is installed.

    Import-gated: this container ships no delta-spark, so calling this
    raises with instructions rather than pretending. With the package,
    the same two primitives are
    ``spark.read.format("delta").option("versionAsOf", v)`` and
    ``.option("readChangeFeed", "true").option("startingVersion", v+1)``
    filtered to ``_change_type = 'insert'``.
    """
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError as ex:  # pragma: no cover - environment-dependent
        raise ImportError(
            "delta-spark is not installed in this environment; use "
            "VersionedTable (parquet version dirs) which provides the same "
            "snapshot/changes primitives"
        ) from ex
    return DeltaTable.forPath(spark, path)  # pragma: no cover


class DeltaLakeCatalog(DeltaCatalog):
    """DeltaCatalog over REAL Delta Lake tables (SURVEY §2.1 #2's
    primary mapping): un-delta'd plan refs read ``versionAsOf old``,
    PosDeltaScan leaves read the Change Data Feed's insert rows in
    (old, new]. Requires delta-spark + its jars on the session
    (import-gated; this container ships neither — attempted 2026-08-13,
    no package, no jar, installs unavailable — so the parquet
    version-dir ``VersionedDeltaCatalog`` is the tested realization;
    tests/test_delta_lake.py exercises THIS class whenever the package
    exists).
    """

    def __init__(
        self,
        spark: SparkSession,
        paths: dict[str, str],
        version_pins: dict[str, tuple[int, int]],
    ):
        from delta.tables import DeltaTable  # noqa: F401  (import gate)

        self.spark = spark
        self.paths = paths
        self.version_pins = version_pins

    def full(self, name: str) -> DataFrame:
        _, new = self.version_pins[name]
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", new)
            .load(self.paths[name])
        )

    def snapshot(self, name: str) -> DataFrame:
        old, _ = self.version_pins[name]
        return (
            self.spark.read.format("delta")
            .option("versionAsOf", old)
            .load(self.paths[name])
        )

    def delta(self, name: str) -> DataFrame:
        old, new = self.version_pins[name]
        cols = self.full(name).columns
        if old == new:
            return self.full(name).where("1 = 0")
        return (
            self.spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", old + 1)
            .option("endingVersion", new)
            .load(self.paths[name])
            .where("_change_type = 'insert'")
            .select(*cols)
        )


class VersionedDeltaCatalog(DeltaCatalog):
    """DeltaCatalog over VersionedTable storage.

    ``(old, new)`` version pins per table; tables without a pin are
    read at their latest version with an empty delta.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, VersionedTable],
        version_pins: dict[str, tuple[int, int]],
    ):
        self.spark = spark
        self.tables = tables
        self.version_pins = version_pins

    def _pins(self, name: str) -> tuple[int, int]:
        if name in self.version_pins:
            return self.version_pins[name]
        latest = self.tables[name].latest_version()
        return latest, latest

    def full(self, name: str) -> DataFrame:
        _, new = self._pins(name)
        return self.tables[name].snapshot(self.spark, new)

    def snapshot(self, name: str) -> DataFrame:
        old, _ = self._pins(name)
        return self.tables[name].snapshot(self.spark, old)

    def delta(self, name: str) -> DataFrame:
        old, new = self._pins(name)
        if old == new:
            return self.full(name).where("1 = 0")
        return self.tables[name].changes(self.spark, old, new)


class CdfVersionedTable:
    """A versioned table whose commits are CHANGE batches, not appends:
    each version dir holds CDF-shaped rows (``_change_type`` ∈ insert/
    delete/update_preimage/update_postimage) — the on-disk shape Delta
    Lake's Change Data Feed produces, stored as plain parquet.

    This is the retraction-capable sibling of ``VersionedTable``:
    where that class can only grow, a ``CdfVersionedTable`` commit can
    delete and update. Reads:

    - ``changes(a, b)``      — CDF rows committed in (a, b]
    - ``signed_changes(a,b)``— the same, normalized to ``_sign`` ∈ {±1}
    - ``snapshot(v)``        — the table STATE as of ``v``: fold every
      change ≤ v as a signed multiset (net count per distinct row,
      rows with net 0 gone, multiplicity re-expanded). A corrupt
      history (more retractions than insertions of a row) fails inside
      the fold plan via ``raise_error`` — never a silent wrong state.

    The fold is one groupBy over the changes read so far — fine for a
    change-log whose total volume is delta-sized. At 100 TB you
    checkpoint: materialize ``snapshot(v)`` periodically (a plain
    parquet/lakehouse write) and fold only the tail; a real Delta
    table does exactly this with its log + data files.
    """

    def __init__(self, root: str):
        self.root = root

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version:08d}")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            m = _VDIR.match(name)
            if m and os.path.isdir(os.path.join(self.root, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise ValueError(f"no committed versions under {self.root}")
        return vs[-1]

    def write_version(
        self, changes_df: DataFrame, version: int | None = None
    ) -> int:
        """Commit one CDF batch as the next (or given) version."""
        if "_change_type" not in changes_df.columns:
            raise ValueError(
                "CdfVersionedTable commits carry a _change_type column "
                "(use VersionedTable for plain appends)"
            )
        vs = self.versions()
        if version is None:
            version = (vs[-1] + 1) if vs else 0
        if version in vs:
            raise ValueError(f"version {version} already committed")
        changes_df.write.mode("errorifexists").parquet(
            self._version_dir(version)
        )
        return version

    def _read(self, spark: SparkSession, versions: list[int]) -> DataFrame:
        paths = [self._version_dir(v) for v in versions]
        if not paths:
            raise ValueError(f"no versions selected from {self.root}")
        # mergeSchema, as in VersionedTable._read: additive evolution —
        # the signed fold then groups old rows with NULL in the new
        # columns, which is exactly the evolved multiset semantics.
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def changes(self, spark: SparkSession, from_v: int, to_v: int) -> DataFrame:
        """CDF rows committed in (from_v, to_v]."""
        return self._read(
            spark, [v for v in self.versions() if from_v < v <= to_v]
        )

    def signed_changes(
        self, spark: SparkSession, from_v: int, to_v: int
    ) -> DataFrame:
        from ..plans.signed import signed_of_cdf

        return signed_of_cdf(self.changes(spark, from_v, to_v))

    def snapshot(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Table state as of ``version``: signed fold of all changes."""
        from pyspark.sql import functions as F

        from ..plans.signed import SIGN, signed_of_cdf

        if version is None:
            version = self.latest_version()
        sdf = signed_of_cdf(
            self._read(spark, [v for v in self.versions() if v <= version])
        )
        data_cols = [c for c in sdf.columns if c != SIGN]
        net = sdf.groupBy(*data_cols).agg(F.sum(SIGN).alias("_net"))
        guarded = net.where(
            "CASE WHEN _net < 0 THEN CAST(raise_error("
            "'corrupt CDF history: row retracted more times than "
            "inserted') AS BOOLEAN) ELSE _net > 0 END"
        )
        return guarded.withColumn(
            "_dup", F.explode(F.expr("sequence(1, _net)"))
        ).select(*data_cols)


class VersionedSignedCatalog(SignedDeltaCatalog):
    """SignedDeltaCatalog over CdfVersionedTable storage: the signed
    compiler's old/new/changes reads served from a real stored change
    log instead of the predicate-split emulation. Tables without a
    CDF log are static (read from ``sf_dir``, empty change batch).

    ``version_pins[name] = (old_v, new_v)`` — the maintained version
    and the target version, exactly the two points a Delta CDF read
    (``startingVersion``/``endingVersion``) would span.
    """

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        tables: dict[str, "CdfVersionedTable"],
        version_pins: dict[str, tuple[int, int]],
    ):
        super().__init__(spark, sf_dir, specs={})
        self.tables = tables
        self.version_pins = version_pins

    def _pins(self, name: str) -> tuple[int, int]:
        if name in self.version_pins:
            return self.version_pins[name]
        latest = self.tables[name].latest_version()
        return latest, latest

    def old(self, name: str) -> DataFrame:
        if name not in self.tables:
            return self._base(name)
        return self.tables[name].snapshot(self.spark, self._pins(name)[0])

    def new(self, name: str) -> DataFrame:
        if name not in self.tables:
            return self._base(name)
        return self.tables[name].snapshot(self.spark, self._pins(name)[1])

    def cdf_changes(self, name: str) -> DataFrame:
        if name not in self.tables:
            return super().cdf_changes(name)  # static: empty batch
        old_v, new_v = self._pins(name)
        if old_v == new_v:
            empty = self.old(name).where("1 = 0")
            from pyspark.sql import functions as F

            return empty.withColumn("_change_type", F.lit("insert"))
        return self.tables[name].changes(self.spark, old_v, new_v)
