"""Build the 10x scale-decade fixtures under .scale/ (gitignored).

Protocol (SCALE.md "Measured scaling decade"): replicate the fact
tables 10x with per-replica key offsets chosen so every delta/CDC
mod-class split is preserved (offsets are multiples of the mod bases),
while the SF-fixed dimensions stay shared. Each replica then behaves
exactly like the sf0.1 original — same join fan-outs, same change
batches per replica — so output invariants are predictable (counts
scale exactly 10x, group sets stay fixed) and wall-time growth is the
only free variable.

Usage: python tools/make_scale_fixtures.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> .scale/sf1_rel
Idempotent: skips tables whose output already exists.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_delta_queries_spark.catalog import TABLES, load_table  # noqa: E402
from datafusion_delta_queries_spark.session import get_spark  # noqa: E402

REPLICAS = 10

# Per-table replicated key columns. Offsets are per-key multiples of
# _BASE (an LCM of every mod class used in DELTA_PREDICATES/CDC_SPECS:
# 10, 7, 5 -> 70; kept at 10**7 for readable keys), so key % base is
# replica-invariant and every replica carries identical change splits.
_BASE = 70_000_000
_REPLICATED: dict[str, dict[str, int]] = {
    "orders": {"o_orderkey": _BASE},
    "lineitem": {"l_orderkey": _BASE},
    "events": {"event_id": _BASE, "user_id": 100_000_000},
    # doc_id offset is a multiple of 9 (the documents mod-class base);
    # text gets a per-replica tag so contents stay unique per replica —
    # without it identical texts collapse into shared dedup/LSH buckets
    # and bucket populations (not work) would explode 10x.
    "documents": {"doc_id": 90_000_000},
    "embeddings": {"vec_id": _BASE},
}
_TAGGED_TEXT: dict[str, str] = {"documents": "text"}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1_rel",
    )
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-scale-fixtures")
    for name in TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(dst):
            print(f"{name}: exists, skipping")
            continue
        df = load_table(spark, src, name)
        if name in _REPLICATED:
            offs = _REPLICATED[name]
            reps = []
            for r in range(REPLICAS):
                rep = df
                for col, base in offs.items():
                    rep = rep.withColumn(
                        col, (F.col(col) + F.lit(r * base)).cast("bigint")
                    )
                if name in _TAGGED_TEXT:
                    tc = _TAGGED_TEXT[name]
                    rep = rep.withColumn(
                        tc, F.concat(F.col(tc), F.lit(f" xrep{r}"))
                    )
                reps.append(rep)
            from functools import reduce

            df = reduce(lambda a, b: a.unionByName(b), reps)
        tmp = dst + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, dst)
        print(f"{name}: written ({'10x' if name in _REPLICATED else 'shared'})")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
