"""CDC-format incremental read: per-commit change events with before/after
images, inferred by diffing file-slice versions (Hudi RFC-51 "infer from
data files" mode; extension beyond this reference snapshot)."""

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType


def _orders_table(spark, path, **kw):
    return HoodieTable.create(
        spark, path, "orders", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)", **kw)


def test_cow_cdc_events_match_operations(spark, orders, tmp_table_path):
    tbl = _orders_table(spark, tmp_table_path)
    c1 = tbl.bulk_insert(orders).instant
    upd = (orders.filter(F.col("o_orderkey") % 10 == 0)
           .withColumn("o_totalprice", F.col("o_totalprice") + 100.0))
    c2 = tbl.upsert(upd).instant
    dels = orders.filter(F.col("o_orderkey") % 7 == 3).select("o_orderkey")
    c3 = tbl.delete(dels).instant

    cdc = tbl.incremental_cdc(begin=c1).cache()
    by_op = {(r.op, r.ts): r.cnt for r in
             cdc.groupBy("op", "ts").agg(F.count("*").alias("cnt")).collect()}
    assert by_op == {("u", c2): upd.count(), ("d", c3): dels.count()}

    # update images: before + 100 == after, key preserved
    bad = cdc.filter("op = 'u'").filter(
        F.col("before.o_totalprice") + 100.0 != F.col("after.o_totalprice"))
    assert bad.count() == 0
    # delete images carry the pre-image (post-update where both hit)
    d_row = (cdc.filter("op = 'd'")
             .filter(F.col("before.o_orderkey") % 10 == 0).first())
    if d_row is not None:
        orig = orders.filter(
            F.col("o_orderkey") == d_row.before.o_orderkey).first()
        assert abs(d_row.before.o_totalprice
                   - (orig.o_totalprice + 100.0)) < 1e-9
    assert cdc.filter("op = 'd'").filter(
        F.col("after").isNotNull()).count() == 0

    # full range starts with one insert event per original row
    assert tbl.incremental_cdc().filter("op = 'i'").count() == orders.count()


def test_mor_cdc_events_from_delta_commits(spark, orders, tmp_table_path):
    tbl = _orders_table(spark, tmp_table_path,
                        table_type=TableType.MERGE_ON_READ)
    c1 = tbl.bulk_insert(orders).instant
    upd = (orders.filter(F.col("o_orderkey") % 9 == 0)
           .withColumn("o_orderstatus", F.lit("Z")))
    c2 = tbl.upsert(upd).instant

    cdc = tbl.incremental_cdc(begin=c1).cache()
    assert cdc.select("op").distinct().collect() == [("u",)]
    assert cdc.count() == upd.count()
    assert cdc.filter(F.col("after.o_orderstatus") != "Z").count() == 0
    assert cdc.filter(F.col("before.o_orderstatus") == "Z").count() == 0


def test_cdc_replacecommit_partition_delete_emits_deletes(
        spark, orders, tmp_table_path):
    tbl = _orders_table(spark, tmp_table_path)
    c1 = tbl.bulk_insert(orders).instant
    part = tbl.view().partitions()[0]
    n_part = tbl.snapshot().filter(
        F.col("_hoodie_partition_path") == part).count()
    tbl.delete_partitions([part])
    cdc = tbl.incremental_cdc(begin=c1)
    assert cdc.filter("op = 'd'").count() == n_part
    assert cdc.filter("op != 'd'").count() == 0
