"""Property-based RESTORE/snapshot correctness: random CDC histories,
two laws.

Hypothesis generates random commit histories over a small keyed table
(insert / delete-by-predicate / update-by-predicate steps, each a CDF
batch) and asserts, for every generated history and every version v:

    restore-roundtrip   restore(v) makes snapshot(latest) == snapshot(v)
                        while EVERY pre-restore version stays readable
                        and unchanged (history is append-only);
    diff-consistency    snapshot_diff(snapshot(a), snapshot(b)) classifies
                        exactly the keys the commits a+1..b touched —
                        reconciliation agrees with the change log it
                        never read.

Bounded examples (each history costs a handful of Spark jobs); every
run explores fresh histories.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.operators.delta_queries import (
    snapshot_diff,
)
from datafusion_delta_queries_spark.sources.versioned import CdfVersionedTable

KEYS = list(range(1, 13))

# A step is ("delete", mod, rem) | ("update", mod, rem, add) — applied
# to the live state via the table's own merge-on-read DML helpers.
steps = st.lists(
    st.one_of(
        st.tuples(st.just("delete"), st.sampled_from([2, 3, 5]), st.integers(0, 4)),
        st.tuples(
            st.just("update"),
            st.sampled_from([2, 3, 5]),
            st.integers(0, 4),
            st.integers(1, 50),
        ),
    ),
    min_size=1,
    max_size=3,
)


def _state(spark, vt: CdfVersionedTable, v=None):
    return sorted(map(tuple, vt.snapshot(spark, v).select("k", "v").collect()))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(history=steps, data=st.data())
def test_restore_roundtrip_and_diff_consistency(spark, history, data):
    vt = CdfVersionedTable(tempfile.mkdtemp(prefix="restore_prop_"))
    base = spark.createDataFrame([(k, k * 10) for k in KEYS], "k int, v int")
    vt.write_version(base.withColumn("_change_type", F.lit("insert")))
    for step in history:
        if step[0] == "delete":
            _, mod, rem = step
            vt.delete_where(spark, f"k % {mod} = {rem % mod}")
        else:
            _, mod, rem, add = step
            vt.update_where(spark, {"v": f"v + {add}"}, f"k % {mod} = {rem % mod}")
    latest = vt.latest_version()
    before = {v: _state(spark, vt, v) for v in range(latest + 1)}

    # diff-consistency: classified keys == keys whose state differs
    target_v = data.draw(st.integers(0, latest), label="target_v")
    d = snapshot_diff(
        vt.snapshot(spark, target_v),
        vt.snapshot(spark),
        keys=["k"],
        compare_cols=["v"],
    )
    classed = {r["k"]: r["change_type"] for r in d.collect()}
    old_m = dict(before[target_v])
    new_m = dict(before[latest])
    for k in set(old_m) | set(new_m):
        if k not in old_m:
            assert classed[k] == "added"
        elif k not in new_m:
            assert classed[k] == "removed"
        elif old_m[k] != new_m[k]:
            assert classed[k] == "changed"
        else:
            assert classed[k] == "unchanged"

    # restore-roundtrip: state lands on target_v; history untouched
    vt.restore(spark, target_v)
    assert _state(spark, vt) == before[target_v]
    for v, s in before.items():
        assert _state(spark, vt, v) == s, f"pre-restore v{v} changed"
