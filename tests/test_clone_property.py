"""Property test for ShallowCloneTable: random post-clone operation
sequences applied to the source and the clone must stay ISOLATED
(neither side ever sees the other's commits) and each side's snapshot
must equal a direct Python multiset model of its own history. Also
pins that time travel into pre-clone history keeps working from the
clone at any point in the sequence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.sources.versioned import (
    CdfVersionedTable,
    ShallowCloneTable,
)

_BASE = [(k, k * 10) for k in range(10)]

# an op is (target, kind, param): insert a fresh 3-row batch, or
# delete k % 3 == param
_OPS = st.lists(
    st.tuples(
        st.sampled_from(["src", "clone"]),
        st.sampled_from(["insert", "delete"]),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_OPS)
def test_clone_divergence_isolation(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("clonep")
    src = CdfVersionedTable(str(root / "src"))
    src.write_version(
        spark.createDataFrame(_BASE, "k int, v int").withColumn(
            "_change_type", F.lit("insert")
        )
    )
    clone = ShallowCloneTable.create(src, str(root / "clone"), 0)

    model = {"src": dict(_BASE), "clone": dict(_BASE)}
    handles = {"src": src, "clone": clone}
    next_key = 100
    for target, kind, param in ops:
        vt, m = handles[target], model[target]
        if kind == "insert":
            batch = [(next_key + i, (next_key + i) * 10) for i in range(3)]
            next_key += 10
            vt.write_version(
                spark.createDataFrame(batch, "k int, v int").withColumn(
                    "_change_type", F.lit("insert")
                )
            )
            m.update(dict(batch))
        else:
            vt.delete_where(spark, f"k % 3 = {param}")
            for k in [k for k in m if k % 3 == param]:
                del m[k]
        # isolation + model equality after EVERY op
        for side in ("src", "clone"):
            got = {
                r["k"]: r["v"]
                for r in handles[side].snapshot(spark).collect()
            }
            assert got == model[side], (side, ops)
        # pre-clone time travel still works from the clone
        assert clone.snapshot(spark, 0).count() == len(_BASE)
