"""Hash-bucket index: fixed key→file-group routing with zero-I/O tagging
(public HoodieSimpleBucketIndex design; extension beyond this reference
snapshot)."""

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType
from hoodie_spark.config import IndexType, WriteConfig


def _table(spark, path, **kw):
    wc = WriteConfig(index_type=IndexType.BUCKET, bucket_index_num_buckets=4)
    return HoodieTable.create(
        spark, path, "orders", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        write_config=wc, **kw)


def test_bucket_upsert_delete_matches_simple_semantics(
        spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    upd = (orders.filter(F.col("o_orderkey") % 10 == 0)
           .withColumn("o_totalprice", F.col("o_totalprice") + 100.0))
    tbl.upsert(upd)
    tbl.delete(orders.filter(F.col("o_orderkey") % 7 == 3)
               .select("o_orderkey", "o_orderdate"))
    snap = tbl.snapshot().cache()
    assert snap.count() == orders.filter("o_orderkey % 7 != 3").count()
    assert snap.filter("o_orderkey % 10 = 0").count() == \
        snap.join(orders.select("o_orderkey",
                                F.col("o_totalprice").alias("orig")),
                  "o_orderkey") \
        .filter("o_orderkey % 10 = 0") \
        .filter(F.abs(F.col("o_totalprice") - F.col("orig") - 100.0)
                < 1e-9).count()
    # every file group id is a bucket id, never a planner uuid
    fids = {fid for (_pp, fid) in tbl.view().groups}
    assert fids and all(f.startswith("bucket") for f in fids)
    # at most num_buckets groups per partition
    from collections import Counter
    per_pp = Counter(pp for (pp, _f) in tbl.view().groups)
    assert max(per_pp.values()) <= 4


def test_bucket_tagging_reads_no_data_files(spark, orders, tmp_table_path,
                                            monkeypatch):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    # tagging must never open table files: poison the slice reader during
    # tag_location and verify an upsert still plans its routing
    from hoodie_spark import index as index_mod

    def boom(*a, **k):
        raise AssertionError("bucket tagging read a data file")

    real_tag = index_mod.tag_location

    def guarded(spark_, prepared, table, view=None, force_global=False):
        saved = table.read_slices_base
        table.read_slices_base = boom
        try:
            return real_tag(spark_, prepared, table, view=view,
                            force_global=force_global)
        finally:
            table.read_slices_base = saved

    monkeypatch.setattr("hoodie_spark.writer.tag_location", guarded)
    upd = (orders.filter(F.col("o_orderkey") % 11 == 0)
           .withColumn("o_orderstatus", F.lit("B")))
    tbl.upsert(upd)
    assert tbl.snapshot().filter("o_orderstatus = 'B'").count() == upd.count()


def test_bucket_insert_routes_new_partition(spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    n = tbl.snapshot().count()
    fresh = (orders.limit(7)
             .withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000)
             .withColumn("o_orderdate", F.expr(
                 "o_orderdate + interval 400 days")))
    tbl.insert(fresh)
    assert tbl.snapshot().count() == n + 7
    fids = {fid for (_pp, fid) in tbl.view().groups}
    assert all(f.startswith("bucket") for f in fids)


def test_bucket_mor_delta_appends(spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path,
                 table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    upd = (orders.filter(F.col("o_orderkey") % 6 == 0)
           .withColumn("o_orderstatus", F.lit("M")))
    res = tbl.upsert(upd)
    assert all(s["is_delta"] for s in res.stats)
    assert tbl.snapshot().filter("o_orderstatus = 'M'").count() == upd.count()
    tbl.compact()
    assert tbl.read_optimized().filter(
        "o_orderstatus = 'M'").count() == upd.count()
