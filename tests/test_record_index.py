"""Record-level index: tagging equivalence with the scan path."""

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, WriteConfig
from hoodie_spark import record_index

SF_DIR = "/root/testdata/sf0.001"


def _chain(spark, path, use_index):
    """insert → upsert → key-only delete → cluster → upsert again."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cfg = WriteConfig(record_index=use_index,
                      parquet_max_file_size=256 * 1024,
                      parquet_small_file_limit=200 * 1024)
    tbl = HoodieTable.create(spark, path, "ri", ["o_orderkey"], "o_orderdate",
                             partition_expr="date_format(o_orderdate,'yyyy')",
                             write_config=cfg)
    tbl.bulk_insert(orders)
    tbl.upsert(orders.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("o_orderstatus", F.lit("X")))
    tbl.delete(orders.filter(F.col("o_orderkey") % 7 == 3)
               .select("o_orderkey"))
    tbl.cluster(sort_cols=["o_custkey"], target_file_size=64 * 1024 * 1024)
    tbl.upsert(orders.filter(F.col("o_orderkey") % 11 == 1)
               .withColumn("o_orderpriority", F.lit("RI")))
    return tbl


def test_index_matches_scan_path(spark, tmp_table_path):
    import os

    a = _chain(spark, os.path.join(tmp_table_path, "idx"), True)
    b = _chain(spark, os.path.join(tmp_table_path, "scan"), False)
    assert record_index.exists(a)
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    ra = sorted(tuple(r) for r in a.snapshot().select(*cols).collect())
    rb = sorted(tuple(r) for r in b.snapshot().select(*cols).collect())
    assert ra == rb
    # no duplicate keys ever
    n = a.snapshot().count()
    assert a.snapshot().select("o_orderkey").distinct().count() == n


def test_index_survives_rollback(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "ri2", ["o_orderkey"],
                             "o_orderdate",
                             write_config=WriteConfig(record_index=True))
    tbl.bulk_insert(orders)
    c2 = tbl.delete(orders.filter(F.col("o_orderkey") % 2 == 0)
                    .select("o_orderkey")).instant
    tbl.rollback(c2)
    # rolled-back removals must not make those keys look absent
    tbl.upsert(orders.filter(F.col("o_orderkey") % 2 == 0)
               .withColumn("o_orderstatus", F.lit("B")))
    snap = tbl.snapshot()
    assert snap.count() == orders.count()  # upsert updated, didn't duplicate
    assert snap.filter("o_orderstatus = 'B'").count() == \
        orders.filter("o_orderkey % 2 = 0").count()


def test_index_point_lookup_consistency(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "ri3", ["o_orderkey"],
                             "o_orderdate",
                             write_config=WriteConfig(record_index=True))
    tbl.bulk_insert(orders)
    idx = record_index.lookup(tbl)
    assert idx.count() == orders.count()
    # filter_exists goes through the index path
    new = orders.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    only_new = tbl.filter_exists(orders.unionByName(new))
    assert only_new.count() == orders.count()  # existing half filtered out
