"""Edge cases: empty batches, full-delete, re-insert, unpartitioned ops."""

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable

SF_DIR = "/root/testdata/sf0.001"


def test_empty_upsert_and_delete(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    r = tbl.upsert(orders.filter("o_orderkey < 0"))  # empty batch
    assert r.num_records == 0
    tbl.delete(orders.filter("o_orderkey < 0").select("o_orderkey"))
    assert tbl.snapshot().count() == orders.count()


def test_upsert_into_empty_table(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e2", ["o_orderkey"],
                             "o_orderdate")
    tbl.upsert(orders)  # first write is an upsert, not bulk_insert
    assert tbl.snapshot().count() == orders.count()


def test_delete_everything_then_reinsert(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(100)
    tbl = HoodieTable.create(spark, tmp_table_path, "e3", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    tbl.delete(orders.select("o_orderkey"))
    assert tbl.snapshot().count() == 0
    tbl.upsert(orders)
    assert tbl.snapshot().count() == 100


def test_delete_of_absent_keys_is_noop(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e4", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    ghost = orders.select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"))
    r = tbl.delete(ghost)
    assert tbl.snapshot().count() == orders.count()
    assert tbl.timeline.pending() == []


def test_double_upsert_idempotent_content(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e5", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    upd = orders.withColumn("o_orderstatus", F.lit("Q"))
    tbl.upsert(upd)
    tbl.upsert(upd)  # same content again
    snap = tbl.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_orderstatus = 'Q'").count() == orders.count()


def test_mor_full_delete_then_compact(spark, tmp_table_path):
    from hoodie_spark import TableType

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(100)
    tbl = HoodieTable.create(spark, tmp_table_path, "e6", ["o_orderkey"],
                             "o_orderdate", table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    tbl.delete(orders.select("o_orderkey"))
    assert tbl.snapshot().count() == 0       # merge-on-read view
    tbl.compact()
    assert tbl.snapshot().count() == 0       # survives compaction
    assert tbl.read_optimized().count() == 0  # old base must not resurrect
