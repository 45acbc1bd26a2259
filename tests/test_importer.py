"""Parquet-dataset import (importer.py — HDFSParquetImporter parity)."""

import os

import pytest
from pyspark.sql import functions as F

from hoodie_spark import import_parquet


def test_import_bulkinsert_roundtrip(spark, orders, tmp_table_path):
    src = os.path.join(tmp_table_path, "src")
    orders.write.parquet(src)
    tgt = os.path.join(tmp_table_path, "tbl")
    tbl = import_parquet(spark, src, tgt, "orders_imp", ["o_orderkey"],
                         precombine_field="o_orderdate",
                         partition_expr="date_format(o_orderdate,'yyyy')",
                         command="bulkinsert")
    snap = tbl.snapshot()
    assert snap.count() == orders.count()
    # imported rows are properly keyed + partitioned: an upsert routes
    # by key instead of duplicating
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", F.lit("Q")))
    assert tbl.snapshot().count() == orders.count()
    assert tbl.snapshot().filter("o_orderstatus='Q'").count() == 10


def test_import_refuses_existing_target_and_bad_args(
        spark, orders, tmp_table_path):
    src = os.path.join(tmp_table_path, "src")
    orders.write.parquet(src)
    tgt = os.path.join(tmp_table_path, "tbl")
    import_parquet(spark, src, tgt, "orders_imp", ["o_orderkey"])
    with pytest.raises(FileExistsError):
        import_parquet(spark, src, tgt, "orders_imp", ["o_orderkey"])
    with pytest.raises(ValueError, match="command"):
        import_parquet(spark, src, tgt + "2", "x", ["o_orderkey"],
                       command="merge")
    with pytest.raises(ValueError, match="missing from source"):
        import_parquet(spark, src, tgt + "3", "x", ["nope"])


def test_import_rejects_null_keys(spark, orders, tmp_table_path):
    src = os.path.join(tmp_table_path, "src")
    orders.withColumn(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 0, None)
        .otherwise(F.col("o_orderkey"))).write.parquet(src)
    with pytest.raises(ValueError, match="NULL record key"):
        import_parquet(spark, src, os.path.join(tmp_table_path, "t"),
                       "x", ["o_orderkey"])
