"""Property test for the signed line-dedup threshold-crossing repair:
under RANDOM CDC batches (random disjoint insert/delete/update mod
classes, random update text suffix), the incremental identity

    n_boiler == old_boiler − left + entered
             == |{line : distinct-doc-count(new state) ≥ DF}|

must hold, along with entered/left/touched/live all matching a direct
two-snapshot recompute in Spark itself (no oracle involved — this
pins the REPAIR algebra, independent of the DuckDB twin that pins
engine parity). This is the class of test that caught the waterfill
empty-frame bug and the same-lineage join inflation pre-driver."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datafusion_delta_queries_spark.operators.llm_pipeline import (
    _LINE_DF,
    _line_presence,
)
from datafusion_delta_queries_spark.operators.signed_queries import (
    q_signed_line_dedup_maintenance,
)
from datafusion_delta_queries_spark.plans.signed import (
    CdcSpec,
    SignedDeltaCatalog,
)

from .conftest import SF_SMALL


@st.composite
def doc_specs(draw):
    k = draw(st.sampled_from([5, 7, 9, 11]))
    residues = draw(
        st.lists(
            st.integers(min_value=0, max_value=10),
            min_size=3,
            max_size=3,
            unique=True,
        ).filter(lambda rs: all(r < 11 for r in rs))
    )
    ins, dele, upd = (r % k for r in residues)
    if len({ins, dele, upd}) < 3:  # mod-k collapse → disjointness lost
        ins, dele, upd = 0, 1 % k, 2 % k
    suffix = draw(st.sampled_from([" r8", " zz yy", " table scan merge x"]))
    return {
        "documents": CdcSpec(
            insert_pred=f"doc_id % {k} = {ins}",
            delete_pred=f"doc_id % {k} = {dele}",
            update_pred=f"doc_id % {k} = {upd}",
            update_set={"text": f"concat(text, '{suffix}')"},
        )
    }


def _direct_recompute(spark, specs):
    """The ground truth from two full snapshots — what the O(|Δ|)
    repair must land on."""
    cat = SignedDeltaCatalog(spark, SF_SMALL, specs=specs)
    ol = _line_presence(cat.old("documents"))
    nl = _line_presence(cat.new("documents"))
    ond = ol.groupBy("line").agg(F.count("*").alias("ndo"))
    nnd = nl.groupBy("line").agg(F.count("*").alias("ndn"))
    n_boiler = nnd.where(f"ndn >= {_LINE_DF}").count()
    # touched = symmetric difference of presence sets, per line
    tch = (
        ol.exceptAll(nl)
        .unionByName(nl.exceptAll(ol))
        .select("line")
        .distinct()
        .localCheckpoint(eager=True)
    )
    x = (
        ond.localCheckpoint(eager=True)
        .join(nnd.localCheckpoint(eager=True), "line", "full")
        .join(tch, "line", "semi")
        .selectExpr("coalesce(ndo, 0) AS ndo", "coalesce(ndn, 0) AS ndn")
        .collect()
    )
    entered = sum(1 for r in x if r["ndo"] < _LINE_DF <= r["ndn"])
    left = sum(1 for r in x if r["ndn"] < _LINE_DF <= r["ndo"])
    return {
        "n_boiler": n_boiler,
        "entered": entered,
        "left_boiler": left,
        "touched_lines": tch.count(),
        "live_postings": nl.count(),
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(specs=doc_specs())
def test_threshold_crossing_repair_matches_recompute(spark, specs):
    got = q_signed_line_dedup_maintenance(spark, SF_SMALL, specs=specs)
    row = got.collect()[0]
    want = _direct_recompute(spark, specs)
    assert {
        "n_boiler": row["n_boiler"],
        "entered": row["entered"],
        "left_boiler": row["left_boiler"],
        "touched_lines": row["touched_lines"],
        "live_postings": row["live_postings"],
    } == want
