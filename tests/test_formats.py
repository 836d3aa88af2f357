"""Source-format breadth: CSV / JSON / ORC round-trip consistency.

The reference reads only in-memory tables in its tests (SURVEY §2.2);
a Spark engine gets every format from the DataSource API. The gate:
writing a table out in each format and reading it back yields exactly
the parquet-read rows — i.e. format choice never changes query
results. (CSV needs explicit schema + timestamp format; that plumbing
is what this test pins.)
"""

from __future__ import annotations

from datafusion_delta_queries_spark.catalog import load_table

from .conftest import SF_SMALL


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_csv_json_orc_round_trip(spark, tmp_path):
    base = load_table(spark, SF_SMALL, "orders")

    p_csv = str(tmp_path / "orders_csv")
    base.write.mode("overwrite").option("header", True).csv(p_csv)
    got_csv = spark.read.schema(base.schema).option("header", True).csv(p_csv)
    assert _same_rows(base, got_csv)

    p_json = str(tmp_path / "orders_json")
    base.write.mode("overwrite").json(p_json)
    got_json = spark.read.schema(base.schema).json(p_json)
    assert _same_rows(base, got_json)

    p_orc = str(tmp_path / "orders_orc")
    base.write.mode("overwrite").orc(p_orc)
    got_orc = spark.read.orc(p_orc)
    assert _same_rows(base, got_orc)
