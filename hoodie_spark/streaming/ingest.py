"""Ingestion pipeline — the DeltaStreamer equivalent.

Reference parity: HoodieDeltaStreamer.java:87-359 / DeltaSync.java:262-311:
source → (transformer chain) → write, checkpoint stored in commit metadata,
``--continuous`` loops with inline compaction; sources in
hudi-utilities/src/main/java/org/apache/hudi/utilities/sources/*.java
(Parquet/Json/Csv DFS, Jdbc, Kafka, Sql, HoodieIncr); transformers
SqlQueryBasedTransformer.java / ChainedTransformer.java /
FlatteningTransformer.java.

Spark-first: each source is ``spark.read.format(...)`` with an explicit
checkpoint protocol; transformers are SQL over a temp view (Catalyst
optimizes the whole source→transform→write pipeline as one job)."""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import TableType

CHECKPOINT_KEY = "deltastreamer_checkpoint"


class Source:
    """fetch(spark, checkpoint) -> (df | None, new_checkpoint)."""

    def fetch(self, spark, checkpoint):  # pragma: no cover - interface
        raise NotImplementedError


@dataclass
class _DFSSource(Source):
    """DFS sources checkpoint on file modification time
    (DFSPathSelector semantics: read files newer than the checkpoint)."""

    path: str
    fmt: str = "parquet"
    # DDL string, StructType, or a schema.SchemaProvider
    schema: object | None = None
    options: dict | None = None

    def fetch(self, spark: SparkSession, checkpoint):
        # listing + mtimes via pyarrow.fs: the drop dir can live on
        # s3:// / gs:// / local alike (same executor-agnostic filesystem
        # layer the staging path uses)
        from pyarrow import fs as pafs

        since = float(checkpoint) if checkpoint else -1.0
        files, max_mtime = [], since
        root = self.path
        if "://" in root:
            fsys, norm = pafs.FileSystem.from_uri(root)
            scheme = root.split("://", 1)[0] + "://"
        else:
            fsys, norm = pafs.LocalFileSystem(), os.path.abspath(root)
            scheme = ""
        info = fsys.get_file_info(norm)
        if info.type == pafs.FileType.NotFound:
            return None, checkpoint
        infos = (fsys.get_file_info(pafs.FileSelector(norm))
                 if info.type == pafs.FileType.Directory else [info])
        for fi in infos:
            # immediate children are the load units — plain files OR
            # Spark-written .parquet DIRECTORIES (their mtime bumps when
            # part files land, same contract the os.listdir era had)
            base = os.path.basename(fi.path.rstrip("/"))
            if base.endswith(("_SUCCESS", ".crc")) or base.startswith("."):
                continue
            m = fi.mtime.timestamp() if fi.mtime else 0.0
            if m > since:
                files.append(scheme + fi.path if scheme else fi.path)
                max_mtime = max(max_mtime, m)
        if not files:
            return None, checkpoint
        from .schema import resolve_schema

        reader = spark.read
        resolved = resolve_schema(self.schema, spark)
        if resolved is not None:
            reader = reader.schema(resolved)
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        return reader.format(self.fmt).load(files), repr(max_mtime)


class ParquetDFSSource(_DFSSource):
    def __init__(self, path, **kw):
        super().__init__(path, "parquet", **kw)


class JsonDFSSource(_DFSSource):
    def __init__(self, path, **kw):
        super().__init__(path, "json", **kw)


class CsvDFSSource(_DFSSource):
    def __init__(self, path, schema=None, options=None):
        super().__init__(path, "csv", schema,
                         {"header": "true", **(options or {})})


class OrcDFSSource(_DFSSource):
    """ORCDFSSource.java — ORC is a native Spark format, so the generic
    mtime-checkpointed DFS selector covers it with fmt='orc'."""

    def __init__(self, path, **kw):
        super().__init__(path, "orc", **kw)


@dataclass
class JdbcSource(Source):
    """JdbcSource.java — incremental on a monotonically increasing column.

    One JDBC scan per round: the filtered batch is persisted and
    materialized by the checkpoint-max aggregation, so the downstream
    write job reads the cache instead of re-querying the source table
    (which may be a production OLTP database). The pin is released on
    the next fetch — bounded by one micro-batch, same discipline as the
    Ingestor's dedup batch pin."""

    url: str
    table: str
    incr_column: str
    options: dict | None = None

    _prev = None  # previous round's cached batch (not a dataclass field)

    def _load(self, spark):
        """The raw JDBC read — a seam so tests can substitute a fake."""
        reader = (spark.read.format("jdbc").option("url", self.url)
                  .option("dbtable", self.table))
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        return reader.load()

    def fetch(self, spark, checkpoint):
        df = self._load(spark)
        if checkpoint:
            df = df.filter(F.col(self.incr_column) > checkpoint)
        df = df.persist()
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None
        # this action materializes the cache: the ONE source scan
        row = df.agg(F.max(self.incr_column)).collect()[0]
        if row[0] is None:
            df.unpersist()
            return None, checkpoint
        self._prev = df
        return df, str(row[0])


@dataclass
class KafkaSource(Source):
    """Json/AvroKafkaSource — batch read of a topic with offset checkpoints.
    Requires the spark-sql-kafka package on the classpath (gated)."""

    bootstrap_servers: str
    topic: str
    value_schema: str | None = None  # DDL; parses value JSON when set
    options: dict | None = None

    def fetch(self, spark, checkpoint):
        reader = (spark.read.format("kafka")
                  .option("kafka.bootstrap.servers", self.bootstrap_servers)
                  .option("subscribe", self.topic)
                  .option("startingOffsets", checkpoint or "earliest"))
        for k, v in (self.options or {}).items():
            reader = reader.option(k, v)
        df = reader.load()
        import json
        rows = df.groupBy("partition").agg(F.max("offset").alias("mx")).collect()
        if not rows:
            return None, checkpoint
        new_ck = json.dumps(
            {self.topic: {str(r["partition"]): r["mx"] + 1 for r in rows}})
        if self.value_schema:
            from .schema import resolve_schema

            df = df.select(F.from_json(
                F.col("value").cast("string"),
                resolve_schema(self.value_schema, spark)).alias("v")
            ).select("v.*")
        return df, new_ck


@dataclass
class SqlSource(Source):
    """SqlSource.java — a SQL statement per round (backfills)."""

    sql: str

    def fetch(self, spark, checkpoint):
        return spark.sql(self.sql), checkpoint


@dataclass
class HoodieIncrSource(Source):
    """HoodieIncrSource.java — incremental-read another hoodie_spark table;
    checkpoint is the source table's last consumed instant."""

    source_table: object

    def fetch(self, spark, checkpoint):
        last = self.source_table.timeline.last_completed()
        if last is None or (checkpoint and last.timestamp <= checkpoint):
            return None, checkpoint
        df = self.source_table.incremental(begin=checkpoint or None,
                                           end=last.timestamp)
        meta = [c for c in df.columns if c.startswith("_hoodie_")]
        return df.drop(*meta), last.timestamp


class Ingestor:
    """HoodieDeltaStreamer: source → transform → write, checkpoint in commit
    metadata, optional continuous mode with inline compaction."""

    def __init__(self, table, source: Source,
                 transformer_sql: str | None = None,
                 transformers: list | None = None,
                 operation: str = "upsert",
                 compact_every: int | None = None,
                 initial_checkpoint: str | None = None,
                 deduper=None,
                 compact_state_every: int | None = 16,
                 state_retention_instants: int | None = None,
                 index_maintainers: list | None = None):
        self.table = table
        self.source = source
        self.transformer_sql = transformer_sql
        # list of Transformer / callables, applied in order after
        # transformer_sql (ChainedTransformer.java semantics)
        self.transformers = list(transformers or [])
        self.operation = operation
        self.compact_every = compact_every
        # InitialCheckpointProvider / --checkpoint: where to start when the
        # table carries no checkpoint yet (fresh pipeline over old data)
        self.initial_checkpoint = initial_checkpoint
        # optional IncrementalDeduper: each batch is filtered against the
        # table's accumulated dedup state (filterExists generalized to
        # content/near-dup identity), and the WHOLE batch — kept and
        # dropped — is registered as seen after the commit
        self.deduper = deduper
        # fold the per-batch appended state files every N synced batches so
        # a long-running pipeline's state scan width stays bounded
        # (n_buckets files, duplicates collapsed) instead of growing by
        # 2*n_buckets files per micro-batch
        self.compact_state_every = compact_state_every
        # bounded-window dedup: when set, each state compaction also
        # evicts signatures last seen more than N completed data
        # instants ago (old duplicates become re-admittable — the
        # allowed direction; state size stays bounded by the window)
        self.state_retention_instants = state_retention_instants
        # optional IvfIndexMaintainer list: after each successful commit
        # every maintainer catches its ANN index up to the new instant
        # (watermark + incremental read, so a crash between commit and
        # hook is repaired on the next sync — same contract as the
        # deduper's catch_up)
        self.index_maintainers = list(index_maintainers or [])
        self._dedup_batches = 0

    def checkpoint(self) -> str | None:
        for inst in reversed(self.table.timeline.completed()):
            md = self.table.timeline.metadata(inst)
            ck = md.get("extra", {}).get(CHECKPOINT_KEY)
            if ck is not None:
                return ck
        return self.initial_checkpoint

    def sync_once(self):
        """DeltaSync.syncOnce (DeltaSync.java:262). Returns WriteResult|None."""
        ck = self.checkpoint()
        df, new_ck = self.source.fetch(self.table.spark, ck)
        if df is None:
            return None
        if self.transformer_sql:
            # SqlQueryBasedTransformer: <SRC> placeholder over a temp view
            df.createOrReplaceTempView("src")
            df = self.table.spark.sql(
                self.transformer_sql.replace("<SRC>", "src"))
        for t in self.transformers:
            df = t(self.table.spark, df)
        batch = None
        if self.deduper is not None:
            batch = df.persist()
            df = self.deduper.filter_batch(batch)
        self.table._writer.commit_extra[CHECKPOINT_KEY] = new_ck
        try:
            if self.operation == "insert":
                res = self.table.insert(df)
            elif self.operation == "bulk_insert":
                res = self.table.bulk_insert(df)
            else:
                res = self.table.upsert(df)
            if self.deduper is not None:
                # after the commit: every incoming row (kept or dropped) is
                # now "seen"; a crash before this point is repaired by
                # catch_up()
                self.deduper.advance(batch)
                batch.unpersist()
                self._dedup_batches += 1
                if self.compact_state_every and \
                        self._dedup_batches % self.compact_state_every == 0:
                    retain = None
                    if self.state_retention_instants:
                        # DATA instants only: clean/rollback/savepoint
                        # actions must not shrink the effective dedup
                        # window (retention is documented as "N completed
                        # data instants")
                        from .. import timeline as tl
                        insts = self.table.timeline.completed(
                            tl.DATA_ACTIONS)
                        n = self.state_retention_instants
                        if len(insts) > n:
                            retain = insts[-n].timestamp
                    self.deduper.compact_state(retain_after=retain)
        except BaseException:
            # a failed commit (or advance) must not leak the pinned batch
            # and feature frames into the next continuous-loop retry —
            # unpersist is idempotent, so the happy-path unpersist above
            # and this one never double-free
            if batch is not None:
                batch.unpersist()
                self.deduper._release_pins()
            raise
        for m in self.index_maintainers:
            m.on_commit()
        self._maybe_compact()
        return res

    def _maybe_compact(self):
        if self.compact_every and \
                self.table.config.table_type == TableType.MERGE_ON_READ:
            n = len(self.table.timeline.completed(("deltacommit",)))
            if n and n % self.compact_every == 0:
                self.table.compact()

    def run_continuous(self, rounds: int):
        """--continuous bounded to N rounds (HoodieDeltaStreamer.java:159)."""
        out = []
        for _ in range(rounds):
            out.append(self.sync_once())
        return out


class MultiTableIngestor:
    """HoodieMultiTableDeltaStreamer.java — run several table pipelines from
    one loop; each keeps its own checkpoint in its own commit metadata."""

    def __init__(self, ingestors: list):
        self.ingestors = list(ingestors)

    def sync_once(self) -> list:
        return [ing.sync_once() for ing in self.ingestors]

    def run_continuous(self, rounds: int) -> list:
        return [self.sync_once() for _ in range(rounds)]
