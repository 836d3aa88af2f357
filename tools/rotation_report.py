"""Rotation-ledger report: latest driver-check round per query.

Recomputes, from the committed CORRECTNESS_r*.json series, what every
round's verdict wants to know:

- latest-check distribution (how stale is each query's newest green row)
- never-driver-checked queries (registered but no row yet)
- any query whose LATEST row failed (must be zero)
- the upcoming window (first 50 of queries()) annotated by staleness

Usage: python tools/rotation_report.py [--no-spark]
(--no-spark skips the registry import and reports on the series only.)
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_checks() -> dict[str, tuple[int, bool]]:
    latest: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = bool(row.get("rows_match")) and row.get("hash_match") is not False
            latest[name] = (rnd, ok)
    return latest


def main() -> int:
    latest = latest_checks()
    dist = Counter(rnd for rnd, _ in latest.values())
    print("latest-check distribution:", dict(sorted(dist.items())))
    failures = sorted(n for n, (_, ok) in latest.items() if not ok)
    print(f"latest-check failures: {len(failures)}", failures or "")

    if "--no-spark" in sys.argv:
        return 1 if failures else 0

    sys.path.insert(0, REPO)
    from datafusion_delta_queries_spark.operators import (
        DRIVER_WINDOW_PRIORITY,
        registry,
    )

    # registry() needs no SparkSession — it only merges dicts
    queries, oracles = registry()
    never = sorted(set(queries) - set(latest))
    print(f"registered: {len(queries)}; oracled: {len(oracles)}; "
          f"never driver-checked: {len(never)}", never or "")
    window = list(queries)[:50]
    assert window == list(DRIVER_WINDOW_PRIORITY)[:50]
    stale = sorted(
        (latest[n][0], n) for n in latest if n in queries
    )[: 15]
    print("stalest 15:", stale)
    ann = Counter(
        "never" if n not in latest else f"r{latest[n][0]}" for n in window
    )
    print("window staleness mix:", dict(sorted(ann.items())))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
