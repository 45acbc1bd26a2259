"""Streaming sink/source + DeltaStreamer-equivalent ingest tests
(TestHoodieDeltaStreamer.java shapes: checkpointed micro-batches,
duplicate/late events across batches, streaming-replay == snapshot)."""

import os
import tempfile

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType
from hoodie_spark.streaming import (HoodieIncrSource, Ingestor,
                                    ParquetDFSSource, foreach_batch_writer,
                                    incremental_batches)


def make_events_table(spark, path, table_type=TableType.COPY_ON_WRITE):
    return HoodieTable.create(spark, path, "events",
                              recordkey_fields=["event_id"],
                              precombine_field="ts",
                              partition_fields=["event_type"],
                              table_type=table_type)


def test_ingest_checkpointed_batches(spark, events, tmp_table_path):
    """3 micro-batches with overlapping (duplicate) event_ids; the
    ordering-field merge keeps the latest ts per key."""
    tbl = make_events_table(spark, tmp_table_path)
    ing = Ingestor.__new__(Ingestor)  # configure per-batch below

    batches = [
        events.filter("event_id % 3 = 0"),
        events.filter("event_id % 3 = 1").unionByName(
            events.filter("event_id % 3 = 0")
            .withColumn("ts", F.expr("ts + interval 1 hour"))
            .withColumn("value", F.lit(7777.0))),
        events.filter("event_id % 3 = 2"),
    ]
    src_dir = tempfile.mkdtemp(prefix="ingest_src_")
    ing = Ingestor(tbl, ParquetDFSSource(src_dir))
    import time
    for i, b in enumerate(batches):
        sub = os.path.join(src_dir, f"batch_{i}.parquet")
        b.write.mode("overwrite").parquet(sub)
        os.utime(sub, (time.time() + i, time.time() + i))
        res = ing.sync_once()
        assert res is not None
    assert ing.sync_once() is None  # nothing new -> no commit

    snap = tbl.snapshot()
    assert snap.count() == events.count()
    # batch-2 re-sent %3=0 keys with newer ts: they must show value 7777
    assert snap.filter("value = 7777.0").count() == \
        events.filter("event_id % 3 = 0").count()
    assert ing.checkpoint() is not None


def test_ingest_sql_transformer(spark, events, tmp_table_path):
    tbl = HoodieTable.create(spark, tmp_table_path, "events_agg",
                             recordkey_fields=["event_id"],
                             precombine_field="ts")
    src_dir = tempfile.mkdtemp(prefix="ingest_tr_")
    events.limit(100).write.mode("overwrite").parquet(
        os.path.join(src_dir, "b0.parquet"))
    ing = Ingestor(tbl, ParquetDFSSource(src_dir),
                   transformer_sql="SELECT *, value * 2 AS value2 FROM <SRC>")
    ing.sync_once()
    snap = tbl.snapshot()
    assert "value2" in snap.columns
    assert snap.filter("abs(value2 - 2*value) > 1e-9").count() == 0


def test_incremental_source_replay_equals_snapshot(spark, events, tmp_table_path):
    tbl = make_events_table(spark, tmp_table_path)
    tbl.bulk_insert(events.filter("event_id < 400"))
    tbl.upsert(events.filter("event_id >= 400 and event_id < 700"))
    tbl.upsert(events.filter("event_id < 100")
               .withColumn("ts", F.expr("ts + interval 1 hour"))
               .withColumn("value", F.lit(-3.0)))
    # replay all micro-batches, latest record per key wins
    seen = {}
    n_batches = 0
    for offset, batch in incremental_batches(tbl):
        n_batches += 1
        for r in batch.select("event_id", "value").collect():
            seen[r[0]] = r[1]
    assert n_batches == 3
    snap = {r[0]: r[1] for r in tbl.snapshot().select("event_id", "value").collect()}
    assert seen == snap


def test_hoodie_incr_source_table_to_table(spark, events, tmp_table_path):
    """hudi-to-hudi pipeline (HoodieIncrSource): downstream table follows
    upstream commits via incremental reads."""
    up_path = tmp_table_path + "_up"
    up = make_events_table(spark, up_path)
    down = HoodieTable.create(spark, tmp_table_path, "events_down",
                              recordkey_fields=["event_id"],
                              precombine_field="ts")
    ing = Ingestor(down, HoodieIncrSource(up))
    up.bulk_insert(events.filter("event_id < 300"))
    ing.sync_once()
    assert down.snapshot().count() == 300
    up.upsert(events.filter("event_id >= 300 and event_id < 500"))
    ing.sync_once()
    assert down.snapshot().count() == 500
    assert ing.sync_once() is None
    import shutil
    shutil.rmtree(up_path, ignore_errors=True)


def test_structured_streaming_sink(spark, events, tmp_table_path):
    """Real writeStream → foreachBatch -> upsert, with availableNow."""
    tbl = make_events_table(spark, tmp_table_path)
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    events.limit(500).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(events.schema).parquet(src_dir))
    q = (stream.writeStream
         .foreachBatch(foreach_batch_writer(tbl))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    assert tbl.snapshot().count() == 500
    # replaying the same batch id is a no-op (exactly-once)
    fn = foreach_batch_writer(tbl)
    n_commits = len(tbl.commits())
    fn(events.limit(10), 0)
    assert len(tbl.commits()) == n_commits


def test_multi_table_ingestor(spark, tmp_table_path):
    import os

    from hoodie_spark import HoodieTable
    from hoodie_spark.streaming import Ingestor, MultiTableIngestor, ParquetDFSSource

    t1 = HoodieTable.create(spark, os.path.join(tmp_table_path, "a"), "a",
                            ["o_orderkey"], "o_orderdate")
    t2 = HoodieTable.create(spark, os.path.join(tmp_table_path, "b"), "b",
                            ["c_custkey"])
    multi = MultiTableIngestor([
        Ingestor(t1, ParquetDFSSource("/root/testdata/sf0.001/orders.parquet")),
        Ingestor(t2, ParquetDFSSource("/root/testdata/sf0.001/customer.parquet")),
    ])
    res = multi.sync_once()
    assert len(res) == 2 and all(r is not None for r in res)
    assert t1.snapshot().count() == 1500
    assert t2.snapshot().count() > 0
    # second round: sources unchanged -> both no-ops
    assert multi.sync_once() == [None, None]


def test_cli_inspection(spark, tmp_table_path):
    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "cli", ["o_orderkey"],
                             "o_orderdate",
                             partition_expr="date_format(o_orderdate,'yyyy')")
    tbl.bulk_insert(orders)
    tbl.upsert(orders.filter(F.col("o_orderkey") % 2 == 0)
               .withColumn("o_orderstatus", F.lit("X")))
    files = tbl.files()
    assert files and all(f["base_file"] for f in files)
    st = tbl.stats()
    assert st["total_records"] == 1500
    assert st["file_groups"] == len(files)
    assert st["commits"] == len(tbl.commits()) >= 2


def test_async_table_services(spark, tmp_table_path):
    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable, TableType
    from hoodie_spark.streaming import AsyncTableServices, foreach_batch_writer

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "async", ["o_orderkey"],
                             "o_orderdate", table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    services = AsyncTableServices(tbl, compact_every=2)
    fn = foreach_batch_writer(tbl, services=services)
    for i in range(4):  # 4 delta commits -> background compaction fires
        fn(orders.filter(F.col("o_orderkey") % 5 == i)
           .withColumn("o_orderstatus", F.lit(f"S{i}")), i)
    services.stop()
    assert any(c["operation"] == "compact" for c in tbl.commits())
    snap = tbl.snapshot()
    assert snap.count() == orders.count()
    for i in range(4):
        assert snap.filter(f"o_orderstatus = 'S{i}'").count() == \
            orders.filter(F.col("o_orderkey") % 5 == i).count()


def test_async_clustering_recent_days(spark, tmp_table_path):
    """cluster_every wiring: the service thread schedules clustering with
    the recent-days plan, so only the newest partitions are rewritten
    (AsyncClusteringService + SparkRecentDaysClusteringPlanStrategy)."""
    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable
    from hoodie_spark.streaming import AsyncTableServices, foreach_batch_writer

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "async_cl", ["o_orderkey"], "o_orderdate",
        partition_expr="date_format(o_orderdate,'yyyy')")
    old_parts = sorted(set(
        r[0] for r in orders.select(
            F.date_format("o_orderdate", "yyyy")).distinct().collect()))
    services = AsyncTableServices(tbl, cluster_every=4)
    fn = foreach_batch_writer(tbl, services=services)
    for i in range(4):  # 4 commits of small files -> clustering fires
        fn(orders.filter(F.col("o_orderkey") % 4 == i), i)
    services.stop()
    assert any(c["operation"] == "cluster" for c in tbl.commits())
    # only the 2 most recent partitions were rewritten by the replacecommit
    lookback = set(old_parts[-2:])
    t = next(c["instant"] for c in tbl.commits()
             if c["operation"] == "cluster")
    rewritten = {sl.partition for sl in tbl.view().latest_slices()
                 if sl.base_instant == t}
    assert rewritten and rewritten <= lookback
    assert tbl.snapshot().count() == orders.count()


def test_stateful_dedup_across_batches(spark, tmp_table_path):
    import os
    import time

    from hoodie_spark.streaming import stateful_dedup

    src = os.path.join(tmp_table_path, "src")
    ckpt = os.path.join(tmp_table_path, "ckpt")
    out = os.path.join(tmp_table_path, "out")
    os.makedirs(src, exist_ok=True)
    schema = "id long, v string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful_dedup(stream, ["id"]).writeStream
             .format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame([(1, "a"), (2, "b"), (1, "dup-in-batch")], schema) \
         .coalesce(1).write.mode("append").parquet(src)
    run_once()
    # second batch: 1 and 2 are replays, 3 is new
    spark.createDataFrame([(1, "later-dup"), (2, "later-dup"), (3, "c")],
                          schema).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = {r.id: r.v for r in spark.read.schema(schema).parquet(out).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3] == "c" and got[2] == "b"
    assert got[1] in ("a", "dup-in-batch")  # first batch won; never "later-dup"


def test_stateful_session_counts(spark, tmp_table_path):
    import datetime as dt
    import os

    from hoodie_spark.streaming import stateful_session_counts

    src = os.path.join(tmp_table_path, "s2src")
    ckpt = os.path.join(tmp_table_path, "s2ckpt")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts timestamp"
    base = dt.datetime(2024, 1, 1)

    spark.createDataFrame(
        [(7, base), (7, base + dt.timedelta(seconds=10))], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    out = os.path.join(tmp_table_path, "s2out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stateful_session_counts(stream, "user_id", "ts", 1800)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    rows = {(r.user_id, r.session_n, r.n_events) for r in
            spark.read.parquet(out).collect()}
    assert rows == {(7, 0, 2)}

    # next batch: gap > 30 min -> new session, carried state
    spark.createDataFrame([(7, base + dt.timedelta(seconds=5000))], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {(r.user_id, r.session_n, r.n_events) for r in
            spark.read.parquet(out).collect()}
    assert rows == {(7, 0, 2), (7, 1, 1)}


def test_kafka_source_offset_roundtrip(spark):
    """KafkaSource offset protocol (JsonKafkaSource/KafkaOffsetGen.java):
    the checkpoint is a {topic: {partition: next_offset}} JSON string fed
    back as startingOffsets — verified against a mocked kafka reader."""
    import json

    from hoodie_spark.streaming.ingest import KafkaSource

    kafka_df = spark.createDataFrame(
        [(0, 0, '{"k": 1, "v": "a"}'), (0, 1, '{"k": 2, "v": "b"}'),
         (1, 5, '{"k": 3, "v": "c"}')],
        "partition int, offset long, value string",
    ).withColumn("value", F.col("value").cast("binary"))

    class FakeReader:
        def __init__(self, df):
            self._df = df
            self.opts = {}

        def format(self, fmt):
            assert fmt == "kafka"
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self):
            return self._df

    class FakeSpark:
        def __init__(self, df):
            self.read = FakeReader(df)

    src = KafkaSource(bootstrap_servers="b:9092", topic="t",
                      value_schema="k long, v string")
    fs = FakeSpark(kafka_df)
    df, ck = src.fetch(fs, None)
    assert fs.read.opts["startingOffsets"] == "earliest"
    assert fs.read.opts["subscribe"] == "t"
    # next offset per partition = max consumed + 1
    assert json.loads(ck) == {"t": {"0": 2, "1": 6}}
    # value JSON parsed through the declared schema
    assert sorted(tuple(r) for r in df.collect()) == \
        [(1, "a"), (2, "b"), (3, "c")]

    # round-trip: the returned checkpoint is fed back verbatim
    fs2 = FakeSpark(kafka_df.limit(0))
    df2, ck2 = src.fetch(fs2, ck)
    assert fs2.read.opts["startingOffsets"] == ck
    assert df2 is None and ck2 == ck


def test_schema_providers(spark, tmp_table_path):
    """FilebasedSchemaProvider / SchemaRegistryProvider / static DDL all
    resolve to the same StructType and drive a CSV ingest identically."""
    from hoodie_spark.streaming import (CsvDFSSource, FileBasedSchemaProvider,
                                        SchemaRegistryProvider,
                                        StaticSchemaProvider)
    from hoodie_spark.streaming.schema import resolve_schema

    ddl = "id bigint, name string, score double"
    expected = resolve_schema(StaticSchemaProvider(ddl), spark)

    os.makedirs(tmp_table_path, exist_ok=True)
    sf = os.path.join(tmp_table_path, "schema.ddl")
    with open(sf, "w") as f:
        f.write(ddl)
    assert resolve_schema(FileBasedSchemaProvider(sf), spark) == expected

    # registry: Confluent-style {"schema": ...} payload via injected fetcher
    import json as _json
    reg = SchemaRegistryProvider(
        "http://registry/subjects/t/versions/latest",
        fetcher=lambda url: _json.dumps({"schema": ddl}))
    assert resolve_schema(reg, spark) == expected
    # raw-text registry payload also accepted
    assert resolve_schema(
        SchemaRegistryProvider("u", fetcher=lambda u: ddl), spark) == expected

    # end-to-end: provider-driven CSV source reads with the declared types
    src_dir = os.path.join(tmp_table_path, "csv")
    os.makedirs(src_dir)
    with open(os.path.join(src_dir, "a.csv"), "w") as f:
        f.write("id,name,score\n1,a,0.5\n2,b,1.5\n")
    src = CsvDFSSource(src_dir, schema=FileBasedSchemaProvider(sf))
    df, _ck = src.fetch(spark, None)
    assert df.schema == expected
    assert df.count() == 2


def test_transformer_chain_flattening_dms(spark, tmp_table_path):
    """FlatteningTransformer + AWSDmsTransformer + ChainedTransformer
    semantics (FlatteningTransformer.java:56, AWSDmsTransformer.java)."""
    from hoodie_spark.streaming import (AWSDmsTransformer, ChainedTransformer,
                                        FlatteningTransformer,
                                        SqlQueryTransformer)

    df = spark.sql("""
        select 1 as id,
               named_struct('city', 'x', 'geo',
                            named_struct('lat', 1.5, 'lon', 2.5)) as addr,
               array(1, 2) as tags
    """)
    flat = FlatteningTransformer().apply(spark, df)
    assert set(flat.columns) == {"id", "addr_city", "addr_geo_lat",
                                 "addr_geo_lon", "tags"}
    row = flat.collect()[0]
    assert row.addr_geo_lat == 1.5 and row.tags == [1, 2]

    dms = AWSDmsTransformer().apply(spark, df)
    assert dms.filter("Op = ''").count() == 1
    # already-present Op passes through untouched
    assert AWSDmsTransformer().apply(
        spark, df.withColumn("Op", F.lit("U"))).filter("Op = 'U'").count() == 1

    chained = ChainedTransformer(
        FlatteningTransformer(), AWSDmsTransformer(),
        SqlQueryTransformer("SELECT id, addr_city, Op FROM <SRC>"))
    out = chained.apply(spark, df)
    assert out.columns == ["id", "addr_city", "Op"]


def test_continuous_aggregate_rollup(spark, events, tmp_table_path):
    """Hypertable-rollup: streaming windowed counts with a watermark,
    upserted into a (window_start, key)-keyed table; a second batch with
    in-watermark late data REFINES the already-written window rows, and
    the final table matches the batch aggregate of everything ingested."""
    import datetime as dt

    from hoodie_spark.streaming import (continuous_aggregate,
                                        create_rollup_table)

    os.makedirs(tmp_table_path)
    src = os.path.join(tmp_table_path, "src")
    ckpt = os.path.join(tmp_table_path, "ckpt")
    os.makedirs(src)
    tbl = create_rollup_table(spark, os.path.join(tmp_table_path, "rollup"),
                              "ev_rollup", ["event_type"])

    first = events.filter("event_id < 600")
    first.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = continuous_aggregate(
            stream, tbl, "ts", ["event_type"], "300 seconds",
            {"cnt": F.count(F.lit(1)), "sum_value": F.sum("value")},
            watermark="10 hours", checkpoint=ckpt,
            trigger_available_now=True)
        q.awaitTermination(180)

    run_once()

    def expected(df):
        return {
            (r[0], r[1]): (r[2], round(r[3], 6)) for r in
            df.groupBy(F.window("ts", "300 seconds").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("s"))
              .select(F.col("w.start"), "event_type", "cnt", "s").collect()}

    def got():
        return {(r[0], r[1]): (r[2], round(r[3], 6)) for r in
                tbl.snapshot().select("window_start", "event_type", "cnt",
                                      "sum_value").collect()}

    assert got() == expected(first)

    # batch 2: the SAME time range again (late-but-in-watermark events) —
    # update mode re-emits refined windows, the upsert rewrites their rows
    second = events.filter("event_id >= 600")
    second.coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert got() == expected(events)
    # rollup table is a real table: time travel still sees the first state
    c1 = tbl.timeline.completed()[0].timestamp
    assert {k: v for k, v in got().items()} != \
        {(r[0], r[1]): (r[2], round(r[3], 6)) for r in
         tbl.snapshot(as_of=c1).select("window_start", "event_type", "cnt",
                                       "sum_value").collect()}


def test_ingest_initial_checkpoint(spark, events, tmp_table_path):
    """InitialCheckpointProvider / --checkpoint: a fresh pipeline starts
    from the supplied checkpoint instead of the beginning."""
    import time

    from hoodie_spark.streaming import Ingestor, ParquetDFSSource

    os.makedirs(tmp_table_path)
    src = os.path.join(tmp_table_path, "src")
    os.makedirs(src)
    old = os.path.join(src, "old.parquet")
    events.limit(100).write.mode("overwrite").parquet(old)
    cutoff = time.time()
    os.utime(old, (cutoff - 100, cutoff - 100))

    tbl = HoodieTable.create(spark, os.path.join(tmp_table_path, "t"),
                             "ev", ["event_id"], "ts")
    # DFS checkpoint = mtime; starting at `cutoff` skips the old file
    ing = Ingestor(tbl, ParquetDFSSource(src),
                   initial_checkpoint=repr(cutoff))
    assert ing.sync_once() is None  # nothing newer than the checkpoint

    new = os.path.join(src, "new.parquet")
    events.filter("event_id >= 100").limit(50).write.mode(
        "overwrite").parquet(new)
    os.utime(new, (cutoff + 5, cutoff + 5))
    assert ing.sync_once() is not None
    assert tbl.snapshot().count() == 50  # old file never ingested


def test_async_logcompaction(spark, tmp_table_path):
    """logcompact_every wiring: background log compaction merges delta
    files while ingestion continues; snapshot stays exact."""
    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable, TableType
    from hoodie_spark.streaming import AsyncTableServices, foreach_batch_writer

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "alc", ["o_orderkey"],
                             "o_orderdate", table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    services = AsyncTableServices(tbl, logcompact_every=3)
    fn = foreach_batch_writer(tbl, services=services)
    for i in range(4):
        fn(orders.filter(F.col("o_orderkey") % 4 == i)
           .withColumn("o_orderstatus", F.lit(f"L{i}")), i)
    services.stop()
    assert any(c["operation"] == "logcompact" for c in tbl.commits())
    snap = tbl.snapshot()
    assert snap.count() == orders.count()
    for i in range(4):
        assert snap.filter(f"o_orderstatus = 'L{i}'").count() == \
            orders.filter(F.col("o_orderkey") % 4 == i).count()


def test_quality_gate_transformer_on_ingest(spark, tmp_table_path):
    """Curation-on-ingest: the quality gate drops failing docs inside the
    ingest pipeline, before any write/index work happens."""
    from hoodie_spark.streaming import QualityGateTransformer

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    gate = QualityGateTransformer("text", min_tokens=30)
    gated = gate(spark, docs)
    from hoodie_spark.functions import gopher_filter
    from hoodie_spark.functions.pipeline import filter_corpus
    exp = gopher_filter(
        filter_corpus(docs, "text", min_tokens=30), "text").count()
    assert gated.count() == exp and 0 < exp < docs.count()

    tbl = HoodieTable.create(
        spark, tmp_table_path, "gated_docs", ["doc_id"], "doc_id")
    tbl.bulk_insert(gated)
    assert tbl.snapshot().count() == exp


def test_debezium_transformer_cdc_to_table(spark, tmp_table_path):
    """Debezium envelopes (c/u/d with before/after images) land as exactly
    one upsert batch: updates win by source position, deletes remove."""
    from hoodie_spark.cdc import apply_cdc
    from hoodie_spark.streaming import DebeziumTransformer

    rows = [
        {"op": "c", "before": None,
         "after": {"id": 1, "v": "a"}, "ts_ms": 10,
         "source": {"lsn": 100}},
        {"op": "c", "before": None,
         "after": {"id": 2, "v": "b"}, "ts_ms": 11,
         "source": {"lsn": 101}},
        {"op": "u", "before": {"id": 1, "v": "a"},
         "after": {"id": 1, "v": "a2"}, "ts_ms": 12,
         "source": {"lsn": 102}},
        {"op": "d", "before": {"id": 2, "v": "b"},
         "after": None, "ts_ms": 13, "source": {"lsn": 103}},
    ]
    df = spark.createDataFrame(
        rows, "op string, before struct<id:long,v:string>, "
              "after struct<id:long,v:string>, ts_ms long, "
              "source struct<lsn:long>")
    flat = DebeziumTransformer()(spark, df)
    assert {"id", "v", "Op", "_event_ts"} <= set(flat.columns)
    # source.lsn wins as the event position
    assert {r["_event_ts"] for r in flat.collect()} == {100, 101, 102, 103}

    tbl = HoodieTable.create(
        spark, tmp_table_path, "dbz", ["id"], "_event_ts")
    tbl.upsert(apply_cdc(flat, op_col="Op", delete_values=("d", "D")))
    snap = {r["id"]: r["v"] for r in tbl.snapshot().collect()}
    assert snap == {1: "a2"}  # update applied, delete removed id=2


def test_corpus_pipeline_transformer_on_ingest(spark, tmp_table_path):
    """The full corpus recipe as an Ingestor transformer: source batch ->
    gate/dedup/decontaminate/quota/shard-pack -> real table write. The
    landed table matches the library composition exactly."""
    import os

    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable
    from hoodie_spark.functions import corpus_pipeline
    from hoodie_spark.streaming import (CorpusPipelineTransformer, Ingestor,
                                        ParquetDFSSource)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    test_split = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    src = os.path.join(tmp_table_path, "src")
    evalp = os.path.join(tmp_table_path, "eval")
    corpus.write.parquet(src)
    test_split.write.parquet(evalp)

    tbl = HoodieTable.create(
        spark, os.path.join(tmp_table_path, "t"), "corpus_sharded",
        ["doc_id"], "doc_id")
    ing = Ingestor(tbl, ParquetDFSSource(src),
                   transformers=[CorpusPipelineTransformer(evalp)])
    assert ing.sync_once() is not None

    got = {(r["doc_id"], r["lang"], r["n_tokens"], r["shard_id"])
           for r in tbl.snapshot().collect()}
    exp = {(r["doc_id"], r["lang"], r["n_tokens"], r["shard_id"])
           for r in corpus_pipeline(corpus, test_split).collect()}
    assert got == exp and len(got) > 0


def test_orc_dfs_source_ingest(spark, tmp_table_path):
    """ORC files feed the same mtime-checkpointed DFS selector: first fetch
    reads everything, a newer file is picked up incrementally, and the
    full Ingestor commit path lands the rows in the table."""
    from hoodie_spark import HoodieTable
    from hoodie_spark.streaming import Ingestor, OrcDFSSource

    src_dir = os.path.join(tmp_table_path, "orc_src")
    base = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, name string, v double")
    base.coalesce(1).write.orc(os.path.join(src_dir, "b0"))
    src = OrcDFSSource(src_dir + "/b0")
    df, ck = src.fetch(spark, None)
    assert df.count() == 2 and set(df.columns) == {"id", "name", "v"}
    none_df, ck2 = src.fetch(spark, ck)
    assert none_df is None and ck2 == ck  # nothing newer

    tbl = HoodieTable.create(spark, os.path.join(tmp_table_path, "t"),
                             "orc_ing", recordkey_fields=["id"])
    ing = Ingestor(tbl, src, operation="upsert")
    assert ing.sync_once() is not None
    assert tbl.snapshot().count() == 2
    # a second batch arrives appended into the directory; the mtime
    # selector re-reads the touched files incrementally
    import time
    time.sleep(0.05)
    more = spark.createDataFrame([(3, "c", 3.5)],
                                 "id bigint, name string, v double")
    more.coalesce(1).write.orc(os.path.join(src_dir, "b0"), mode="append")
    assert ing.sync_once() is not None
    assert tbl.snapshot().count() == 3
