"""Round-7 advisor regression tests: sidecar load order after stats
compaction, heartbeat abandon when _begin's timeline transition fails,
stale-staging sweep in the DataSource writer, pq_codebooks short-corpus
guard, and Debezium all-null tombstone deletes."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark.config import WriteConfig

SF_DIR = "/root/testdata/sf0.001"


def test_sidecar_written_after_compaction_wins(spark, tmp_table_path):
    """compacted.json sorts AFTER timestamp-named sidecars (digits < 'c'),
    so without explicit ordering a stale compacted entry overrides any
    re-ANALYZE written after compaction."""
    from hoodie_spark.services.stats import _load_sidecars, compact_sidecars

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "sidecar_order", ["o_orderkey"],
        "o_orderdate")
    tbl.bulk_insert(orders.limit(200))
    assert tbl.analyze(exprs={"yr": "year(o_orderdate)"}) > 0
    assert compact_sidecars(tbl) > 0
    # redefine the alias and force a re-analyze AFTER compaction
    assert tbl.analyze(exprs={"yr": "year(o_orderdate) + 1000"},
                       force=True) > 0
    merged = _load_sidecars(tbl.base_path)
    for cs in merged.values():
        if "yr" in cs:
            assert cs["yr"][0] >= 2900, \
                "stale compacted.json entry overrode the newer sidecar"


def test_begin_failure_cancels_heartbeat_refresher(spark, orders,
                                                   tmp_table_path):
    """If create_requested raises inside _begin, the already-started
    background heartbeat refresher must be cancelled — otherwise a
    possibly-created pending instant stays heartbeat-live (unreclaimable)
    for the driver's lifetime."""
    tbl = HoodieTable.create(
        spark, tmp_table_path, "hb_begin", ["o_orderkey"], "o_orderdate")
    tbl.bulk_insert(orders.limit(50))
    w = tbl._writer

    boom = RuntimeError("disk full")

    def raise_create(action, instant):
        raise boom

    orig = tbl.timeline.create_requested
    tbl.timeline.create_requested = raise_create
    try:
        with pytest.raises(RuntimeError, match="disk full"):
            w._begin("commit")
    finally:
        tbl.timeline.create_requested = orig
    # no live refresher left behind for the failed instant
    assert w._hb_cancel == {}


def test_datasource_commit_sweeps_stale_staging(spark, orders,
                                                tmp_table_path):
    """Staged parquet from failed/speculative task attempts never appears
    in a commit message; commit() must sweep aged leftovers instead of
    leaking them in .hoodie/.staging forever. Fresh files (a concurrent
    writer's in-flight tasks) must survive."""
    from hoodie_spark.sources import HoodieDataSource

    spark.dataSource.register(HoodieDataSource)
    tbl = HoodieTable.create(
        spark, tmp_table_path, "sweep", ["o_orderkey"], "o_orderdate")
    tbl.bulk_insert(orders.limit(100))

    stage = os.path.join(tmp_table_path, ".hoodie", ".staging")
    os.makedirs(stage, exist_ok=True)
    stale = os.path.join(stage, "part-deadbeef.parquet")
    fresh = os.path.join(stage, "part-cafebabe.parquet")
    for f in (stale, fresh):
        with open(f, "wb") as fh:
            fh.write(b"x")
    old = time.time() - 7200
    os.utime(stale, (old, old))

    upd = orders.limit(20).withColumn("o_orderstatus", F.lit("S"))
    (upd.write.format("hoodie_spark").mode("append")
     .option("operation", "upsert").save(tmp_table_path))

    assert not os.path.exists(stale), "aged orphan staging file leaked"
    assert os.path.exists(fresh), "fresh (possibly in-flight) file removed"
    snap = HoodieTable.load(spark, tmp_table_path).snapshot()
    assert snap.filter("o_orderstatus = 'S'").count() == 20


def test_pq_codebooks_short_corpus_raises(spark):
    """k codes need k corpus rows — a short book would IndexError deep in
    pq_codebooks_trained with no hint of the cause."""
    from hoodie_spark.functions.similarity import pq_codebooks

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(5))
    with pytest.raises(ValueError, match="only 5 rows"):
        pq_codebooks(emb, "vec_id", "embedding", m=8, k=16)


def test_debezium_tombstone_delete_dropped(spark):
    """'d' events with before=null AND after=null (Kafka tombstone style)
    carry no key columns — they must be dropped, not emitted as all-null
    record keys into the downstream upsert."""
    from hoodie_spark.streaming.transform import DebeziumTransformer

    df = spark.createDataFrame(
        [("c", None, {"id": 1, "v": "a"}, 10),
         ("d", {"id": 1, "v": "a"}, None, 20),   # real delete: before image
         ("d", None, None, 30)],                  # tombstone: no images
        "op string, before struct<id:int,v:string>, "
        "after struct<id:int,v:string>, ts_ms long")
    out = DebeziumTransformer().apply(spark, df).collect()
    assert len(out) == 2
    assert all(r["id"] is not None for r in out)
    assert {(r["id"], r["Op"]) for r in out} == {(1, "c"), (1, "d")}
