"""Table sources: versioned storage for the delta compiler.

The reference's ``PosDeltaScan`` means "scan rows appended since the
last maintained version" (delta_node.rs:63-109) and its un-delta'd
join sides mean "the old snapshot" (optimizer_rules/mod.rs:130-149,
SURVEY §4.3). Those two reads are exactly Delta Lake's ``versionAsOf``
time travel and Change Data Feed — but this container has no
delta-spark, so ``versioned`` implements the same two primitives over
plain parquet version directories, and the Delta-backed variant is
import-gated for environments that have the package.
"""

from .versioned import (
    CdfVersionedTable,
    VersionedDeltaCatalog,
    VersionedSignedCatalog,
    VersionedTable,
)

__all__ = [
    "VersionedTable",
    "VersionedDeltaCatalog",
    "CdfVersionedTable",
    "VersionedSignedCatalog",
]
