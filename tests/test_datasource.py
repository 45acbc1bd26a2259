"""Python DataSource surface: spark.read.format('hoodie_spark') and
spark.readStream.format('hoodie_spark') (reference DefaultSource.scala
batch dispatch + HoodieStreamSource.scala:49-169 commit-offset streaming).

The streaming-parity invariant from streaming/source.py holds here too:
replaying every micro-batch with upsert semantics reconstructs the
snapshot."""

import os

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType
from hoodie_spark.sources import HoodieDataSource


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(HoodieDataSource)


def _sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk_cow(spark, path, orders):
    t = HoodieTable.create(spark, path, "dsrc", ["o_orderkey"], "o_orderdate",
                           partition_expr="date_format(o_orderdate,'yyyy')")
    t.bulk_insert(orders)
    t.upsert(orders.filter("o_orderkey % 10 = 0")
             .withColumn("o_totalprice", F.col("o_totalprice") + 1.0))
    t.delete(orders.filter("o_orderkey % 17 = 3").select("o_orderkey"))
    return t


def test_batch_snapshot_matches_native(spark, orders, tmp_table_path):
    t = _mk_cow(spark, tmp_table_path, orders)
    via_ds = spark.read.format("hoodie_spark").load(t.base_path)
    native = t.snapshot()
    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    assert via_ds.schema == native.schema
    assert _sorted(via_ds, cols) == _sorted(native, cols)


def test_batch_incremental_and_time_travel(spark, orders, tmp_table_path):
    t = _mk_cow(spark, tmp_table_path, orders)
    commits = [c["instant"] for c in t.commits()]
    c1 = commits[0]
    inc = (spark.read.format("hoodie_spark")
           .option("queryType", "incremental")
           .option("beginInstant", c1).load(t.base_path))
    native = t.incremental(begin=c1)
    cols = ["o_orderkey", "o_totalprice"]
    assert _sorted(inc, cols) == _sorted(native, cols)

    asof = (spark.read.format("hoodie_spark")
            .option("asOfInstant", c1).load(t.base_path))
    assert _sorted(asof, cols) == _sorted(t.snapshot(as_of=c1), cols)


def test_batch_mor_snapshot_resolves_slices(spark, events, tmp_table_path):
    t = HoodieTable.create(spark, tmp_table_path, "ds_mor", ["event_id"],
                           precombine_field="ts",
                           partition_fields=["event_type"],
                           table_type=TableType.MERGE_ON_READ)
    ev = events.limit(2000).cache()
    t.bulk_insert(ev)
    t.upsert(ev.filter("event_id % 5 = 0")
             .withColumn("value", F.col("value") + 10000.0)
             .withColumn("ts", F.expr("ts + interval 1 hour")))
    t.delete(ev.filter("event_id % 7 = 0").select("event_id", "event_type"))
    via_ds = spark.read.format("hoodie_spark").load(t.base_path)
    native = t.snapshot()
    cols = ["event_id", "value"]
    assert _sorted(via_ds, cols) == _sorted(native, cols)

    ro = (spark.read.format("hoodie_spark")
          .option("queryType", "read_optimized").load(t.base_path))
    assert _sorted(ro, cols) == _sorted(t.read_optimized(), cols)


def test_readstream_replay_equals_snapshot(spark, orders, tmp_table_path):
    """Subscribe with readStream, drain with availableNow, replay with
    upsert semantics -> equals the table snapshot (delete rows arrive as
    tombstone versions whose keys left the snapshot)."""
    src = HoodieTable.create(
        spark, os.path.join(tmp_table_path, "src"), "st", ["o_orderkey"],
        "o_orderdate", partition_expr="date_format(o_orderdate,'yyyy')")
    src.bulk_insert(orders.limit(800))
    src.upsert(orders.limit(400)
               .withColumn("o_orderstatus", F.lit("U")))

    out: dict[int, tuple] = {}

    def absorb(batch_df, batch_id):
        for r in batch_df.collect():
            out[r["o_orderkey"]] = (r["o_orderstatus"], r["_hoodie_commit_time"])

    q = (spark.readStream.format("hoodie_spark").load(src.base_path)
         .writeStream.foreachBatch(absorb)
         .option("checkpointLocation", os.path.join(tmp_table_path, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    snap = {r["o_orderkey"]: (r["o_orderstatus"], r["_hoodie_commit_time"])
            for r in src.snapshot().collect()}
    assert out == snap

    # new commit: restart from the checkpoint, only the delta arrives
    src.upsert(orders.limit(100).withColumn("o_orderstatus", F.lit("V")))
    seen_batches = []

    def absorb2(batch_df, batch_id):
        rows = batch_df.collect()
        seen_batches.append(len(rows))
        for r in rows:
            out[r["o_orderkey"]] = (r["o_orderstatus"], r["_hoodie_commit_time"])

    q = (spark.readStream.format("hoodie_spark").load(src.base_path)
         .writeStream.foreachBatch(absorb2)
         .option("checkpointLocation", os.path.join(tmp_table_path, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert sum(seen_batches) == 100  # only the new commit's rows
    snap = {r["o_orderkey"]: (r["o_orderstatus"], r["_hoodie_commit_time"])
            for r in src.snapshot().collect()}
    assert out == snap


def test_readstream_start_offset_latest(spark, orders, tmp_table_path):
    src = HoodieTable.create(
        spark, os.path.join(tmp_table_path, "src2"), "st2", ["o_orderkey"],
        "o_orderdate")
    src.bulk_insert(orders.limit(500))
    rows = []

    def absorb(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (spark.readStream.format("hoodie_spark")
         .option("startOffset", "latest").load(src.base_path)
         .writeStream.foreachBatch(absorb)
         .option("checkpointLocation", os.path.join(tmp_table_path, "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert rows == []  # nothing after the start offset yet
