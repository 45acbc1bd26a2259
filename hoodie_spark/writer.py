"""Write operators: bulk_insert / insert / upsert / delete / overwrite.

Reference parity: SparkRDDWriteClient.java:118-255 (operation surface),
BaseSparkCommitActionExecutor.java:135-280 (profile → partition → handles),
UpsertPartitioner.java:60-214 (small-file bin packing),
HoodieMergeHandle.java:89-201 / HoodieCreateHandle.java:51 /
HoodieAppendHandle.java:71 (physical write handles),
SparkWriteHelper.java:50 (preCombine dedup),
BulkInsertSortMode.java:25-27 (NONE / GLOBAL_SORT / PARTITION_SORT).

Spark-first execution model (replaces the reference's RDD pipeline):
  * every write is ONE Catalyst-planned DataFrame job ending in a single
    ``write.partitionBy(partition, kind, bucket).parquet(tmp)`` — the
    repartition by bucket guarantees exactly one file per (partition, bucket),
    so "write handles" collapse into the shuffle;
  * dedup(preCombine) = window row_number, index tagging = a join against the
    manifest-pruned key index, merge = union + window (or full-outer join for
    partial-update payloads) — all JVM-side, whole-stage-codegen'd;
  * the driver only plans buckets (greedy bin packing over manifest stats) and
    renames tmp part-files to their final ``fileId_token_instant`` names —
    O(files touched) metadata ops, no data movement;
  * per-file record counts and record-key min/max are harvested from parquet
    FOOTERS (pyarrow, no data scan) and recorded in commit metadata — that
    manifest is what makes upsert index pruning and clean/clustering planning
    O(metadata) at 100 TB.
"""

from __future__ import annotations

import math
import os
import shutil
import urllib.parse
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import timeline as tl
from .config import (COMMIT_SEQNO, COMMIT_TIME, FILE_NAME, IS_DELETED,
                     META_COLUMNS, NO_PARTITION, OPERATION, PARTITION_PATH,
                     RECORD_KEY, BootstrapMode, IndexType, MergePolicy,
                     TableType, WriteConcurrencyMode, WriteConfig,
                     WriteOperation)
from .fsview import FileSystemView
from .index import tag_location
from .keygen import with_keys

# internal shuffle/bucketing columns — never stored
PP = "__pp"
KIND = "__kind"
BUCKET = "__bucket"
OP = "__op"
ORD = "__ord"
INCOMING = "__incoming"
HARD = "__hard"  # hard delete: EmptyHoodieRecordPayload.java — wins regardless of ordering
WRITE_TOKEN = "0-0-0"


class SortMode:
    """BulkInsertSortMode.java:25-27."""

    NONE = "none"
    GLOBAL_SORT = "global_sort"
    PARTITION_SORT = "partition_sort"


class WriteConflictError(Exception):
    """Optimistic concurrency control abort: another writer committed to an
    overlapping file group since this transaction began
    (SimpleConcurrentFileWritesConflictResolutionStrategy.java)."""


class WriteResult:
    def __init__(self, instant: str, operation: str, stats: list[dict]):
        self.instant = instant
        self.operation = operation
        self.stats = stats

    @property
    def num_records(self) -> int:
        return sum(s.get("num_records", 0) for s in self.stats)


def base_file_name(file_id, instant):
    return F.concat(file_id, F.lit(f"_{WRITE_TOKEN}_"), F.lit(instant), F.lit(".parquet"))


def delta_file_name(file_id, instant):
    return F.concat(file_id, F.lit(f"_{instant}.delta.parquet"))


class WriteClient:
    """SparkRDDWriteClient equivalent. One instance per HoodieTable."""

    def __init__(self, table):
        self.table = table
        self.spark = table.spark
        # merged into the next commit's metadata extra (checkpoints / batch
        # ids — Hudi stores the DeltaStreamer checkpoint the same way,
        # DeltaSync.java:311)
        self.commit_extra: dict = {}
        # OCC: instant -> latest completed data instant when the txn began
        self._txn_baseline: dict[str, str] = {}
        # instant -> cancel callable for its background heartbeat refresher
        self._hb_cancel: dict = {}

    # ------------------------------------------------------------ public ops
    def bulk_insert(self, df: DataFrame, sort_mode: str = SortMode.GLOBAL_SORT) -> WriteResult:
        """SparkRDDWriteClient.java:223 — sorted initial load via the row
        writer path (HoodieDatasetBulkInsertHelper.java:115): a plain
        DataFrame write, globally range-sorted by (partition, key).

        The prepared batch is persisted across the sizing count and the
        write job ONLY when combine_before_insert ran (the window dedup
        would otherwise re-execute per pass). For the plain projection
        shape the cache is a measured LOSS: building the InMemoryRelation
        materializes every column (2.7 s at sf0.1 lineitem) while the
        passes it deduplicates are column-pruned — the sizing count reads
        nothing (0.2 s) and only the write job reads full width, once.
        At 100 TB the no-cache shape is also the only one that fits:
        ingest-sized inputs cannot live in executor storage."""
        wcfg = self.table.write_config
        self._ensure_index_ready()
        instant = self._begin(tl.COMMIT)
        try:
            prepared = self._prepare(df)
            pinned = wcfg.combine_before_insert
            if pinned:
                prepared = self._dedup(prepared).persist()
            try:
                n = prepared.count()
                if n == 0:
                    return self._commit(instant, tl.COMMIT, WriteOperation.BULK_INSERT, [])
                if wcfg.index_type == IndexType.BUCKET:
                    # bucket-index tables are bucketed from the FIRST write:
                    # later tag-free upserts rely on every key living in its
                    # hash bucket's file group.
                    #
                    # Initial-load-only guard (Hudi restricts bucket bulk_insert
                    # the same way): bucket fids are deterministic, so a second
                    # bulk_insert into a partition with live groups would write
                    # a NEWER base slice at the same fid containing only the new
                    # batch — latest_slice() would then shadow the earlier
                    # slice and previously committed rows silently vanish.
                    target_pps = [r[0] for r in
                                  prepared.select(PARTITION_PATH)
                                  .distinct().collect()]
                    live = self.table.view().live_group_ids(
                        partitions=target_pps)
                    occupied = sorted(pp for pp, fids in live.items() if fids)
                    if occupied:
                        self._abort_write(instant, [])
                        raise ValueError(
                            "bucket-index bulk_insert is an initial-load "
                            f"operation; partitions {occupied[:5]} already "
                            "have live file groups that deterministic bucket "
                            "fids would shadow — use upsert()/insert() for "
                            "follow-on batches")
                    from .index import bucket_fid_expr
                    fid = bucket_fid_expr(wcfg.bucket_index_num_buckets)
                    arranged = (prepared
                                .repartition(F.col(PARTITION_PATH), fid)
                                .withColumn(BUCKET, fid))
                    write_df = self._stamp_meta(arranged, instant) \
                                   .withColumn(KIND, F.lit("base"))
                    stats = self._write_files(write_df, instant,
                                              already_partitioned=True,
                                              sort_cols=[RECORD_KEY])
                    return self._commit(instant, tl.COMMIT,
                                        WriteOperation.BULK_INSERT, stats,
                                        index_fn=self._index_fn(stats, instant))
                rpf = wcfg.records_per_file()
                num_files = max(1, math.ceil(n / rpf))
                prefix = uuid.uuid4().hex[:13]
                if sort_mode == SortMode.GLOBAL_SORT:
                    arranged = prepared.repartitionByRange(num_files, F.col(PARTITION_PATH), F.col(RECORD_KEY))
                elif sort_mode == SortMode.PARTITION_SORT:
                    arranged = prepared.repartition(num_files, F.col(PARTITION_PATH))
                else:
                    arranged = prepared.repartition(num_files)
                arranged = arranged.withColumn(
                    BUCKET, F.concat(F.lit(prefix + "-"), F.spark_partition_id().cast("string")))
                write_df = self._stamp_meta(arranged, instant).withColumn(KIND, F.lit("base"))
                sort_cols = [RECORD_KEY] if sort_mode != SortMode.NONE else None
                stats = self._write_files(write_df, instant, already_partitioned=True, sort_cols=sort_cols)
                return self._commit(instant, tl.COMMIT, WriteOperation.BULK_INSERT,
                                    stats, index_fn=self._index_fn(stats, instant))
            finally:
                if pinned:
                    prepared.unpersist()

        except BaseException:
            self._hb_abandon(instant)
            raise
    def insert(self, df: DataFrame) -> WriteResult:
        """SparkRDDWriteClient.java:172 — insert with small-file packing, no
        index lookup."""
        return self._upsert_like(df, WriteOperation.INSERT)

    def upsert(self, df: DataFrame) -> WriteResult:
        """SparkRDDWriteClient.java:149."""
        return self._upsert_like(df, WriteOperation.UPSERT)

    def delete(self, df: DataFrame) -> WriteResult:
        """SparkRDDWriteClient.java:248 — delete by key; ``df`` needs the
        record-key (and, for non-global index, partition) source columns."""
        return self._upsert_like(df, WriteOperation.DELETE)

    def filter_exists(self, df: DataFrame) -> DataFrame:
        """HoodieReadClient.java:186 — drop records whose key already exists."""
        prepared = self._prepare(df)
        tagged = tag_location(self.spark, prepared, self.table)
        return tagged.filter(F.col("_target_file_id").isNull()).drop(
            "_target_file_id", "_target_pp", "_target_base_instant")

    def delete_partitions(self, partitions: list[str]) -> WriteResult:
        """SparkRDDWriteClient.java:255 — replacecommit, metadata-only."""
        instant = self._begin(tl.REPLACECOMMIT)
        try:
            view = self.table.view()
            replaced = view.live_group_ids(partitions=partitions)
            return self._commit(instant, tl.REPLACECOMMIT, WriteOperation.DELETE_PARTITION,
                                [], replaced=replaced)

        except BaseException:
            self._hb_abandon(instant)
            raise
    def insert_overwrite(self, df: DataFrame) -> WriteResult:
        """SparkRDDWriteClient.java:198 — replace file groups in the
        partitions touched by ``df`` (HoodieReplaceCommitMetadata)."""
        return self._overwrite(df, WriteOperation.INSERT_OVERWRITE)

    def insert_overwrite_table(self, df: DataFrame) -> WriteResult:
        """SparkRDDWriteClient.java:214."""
        return self._overwrite(df, WriteOperation.INSERT_OVERWRITE_TABLE)

    def bootstrap(self, source_dir: str,
                  mode: str = BootstrapMode.METADATA_ONLY) -> WriteResult:
        """SparkRDDWriteClient.java:144 / SparkBootstrapCommitActionExecutor.

        METADATA_ONLY: register every parquet file under ``source_dir`` in a
        commit without moving or rewriting it — pure driver metadata; one
        footer read per file for record counts (parallelize over an RDD of
        paths at cluster scale). Partition path = the file's directory
        relative to the source root, so the table's partition config must
        produce those same values (e.g. dirs ``1995/`` with
        ``partition_expr="cast(year(o_orderdate) as string)"``) or the index
        won't find bootstrapped records. FULL_RECORD: read + bulk_insert.
        """
        src = (self.spark.read.option("recursiveFileLookup", "true")
               .parquet(source_dir))
        self.table.evolve_schema(src)
        self.table.save_properties()
        if mode == BootstrapMode.FULL_RECORD:
            res = self.bulk_insert(src)
            res.operation = WriteOperation.BOOTSTRAP
            return res

        instant = self._begin(tl.COMMIT)
        try:
            stats: list[dict] = []
            for root, _dirs, files in os.walk(source_dir):
                for fn in sorted(files):
                    if not fn.endswith(".parquet"):
                        continue
                    ap = os.path.abspath(os.path.join(root, fn))
                    pp = os.path.relpath(root, source_dir)
                    pp = "" if pp == "." else pp
                    st = _footer_stats(ap)
                    stats.append({
                        "partition": pp, "file_id": uuid.uuid4().hex[:13] + "-0",
                        "file_name": fn, "path": ap, "instant": instant,
                        "size": os.path.getsize(ap),
                        "num_records": st["num_records"],
                        "min_key": None, "max_key": None,
                        "is_delta": False, "bootstrap": True,
                    })
            return self._commit(instant, tl.COMMIT, WriteOperation.BOOTSTRAP, stats,
                                extra={"bootstrap_mode": mode,
                                       "source_dir": os.path.abspath(source_dir)})

        except BaseException:
            self._hb_abandon(instant)
            raise
    # ------------------------------------------------------------- internals
    def _begin(self, action: str) -> str:
        """Start the transaction. MUST run before the file-system view
        snapshot / index tagging / workload profiling: the baseline recorded
        here is what _check_conflicts compares against, so any commit that
        completes after planning starts must sort above it (the reference's
        TransactionManager begins the transaction before the write is
        planned for the same reason)."""
        if self.table.write_config.failed_writes_policy == "eager":
            from .services.rollback import rollback_failed_writes
            rollback_failed_writes(self.table)
        instant = self.table.timeline.new_instant_time()
        last = self.table.timeline.last_completed()
        self._txn_baseline[instant] = last.timestamp if last else ""
        # heartbeat FIRST: a pending instant must never be visible without
        # a live beat, or a concurrent eager reclaimer in the gap would
        # treat this brand-new write as a dead one and roll it back. A
        # background refresher then keeps it live for the write's whole
        # duration — Spark jobs routinely outlast the expiry on a loaded
        # cluster, and a stale beat mid-write is a reclaimable-looking
        # LIVE write (HoodieHeartbeatClient does the same)
        hb = tl.Heartbeat(self.table.base_path)
        hb.refresh(instant)
        expiry = self.table.write_config.heartbeat_expiry_s
        self._hb_cancel[instant] = hb.auto_refresh(
            instant, max(0.05, expiry / 4))
        try:
            self.table.timeline.create_requested(action, instant)
            self.table.timeline.transition_inflight(action, instant)
        except BaseException:
            # the instant never escapes _begin, so no caller's except
            # block will _hb_abandon it — without this, the refresher
            # keeps a possibly-created pending instant heartbeat-live
            # (unreclaimable) for the driver's lifetime
            self._hb_abandon(instant)
            raise
        return instant

    def _hb_abandon(self, instant: str) -> None:
        """A write died between _begin and publish: cancel the background
        refresher but LEAVE the beat file — it goes stale after
        heartbeat_expiry_s and reclamation (lazy or eager) then rolls the
        pending instant back. Without the cancel, the daemon thread keeps
        the zombie looking live for the driver's lifetime and its partial
        files are never reclaimed."""
        cancel = self._hb_cancel.pop(instant, None)
        if cancel is not None:
            cancel()

    def _stop_heartbeat(self, instant: str) -> None:
        """Cancel the background refresher, THEN remove the beat file —
        the other order lets a late beat resurrect a published/aborted
        instant's heartbeat and block reclamation forever."""
        cancel = self._hb_cancel.pop(instant, None)
        if cancel is not None:
            cancel()
        tl.Heartbeat(self.table.base_path).stop(instant)

    def _ensure_index_ready(self) -> None:
        """Init/backfill the record index BEFORE any table lock is taken
        (ensure_initialized acquires the lock itself; calling it from inside
        _commit's lock would deadlock the non-reentrant file lock)."""
        if self.table.write_config.record_index:
            from . import record_index
            record_index.ensure_initialized(self.table)

    def _index_fn(self, stats: list[dict], instant: str, dels=None):
        """Record-index maintenance closure, run by _commit AFTER the OCC
        conflict check (inside the lock): an aborted instant must never
        leave index entries behind — its 'R' rows would make still-live keys
        look removed and re-tag as inserts (duplicates).

        The entry DataFrame is computed AND materialized here, before the
        lock is taken: the expensive Spark jobs (reading the just-written
        base files, probing the delete batch) run lock-free; inside the lock
        only the parquet append remains, keeping lock hold time short for
        concurrent writers (lock_timeout_s)."""
        if not self.table.write_config.record_index:
            return None
        from . import record_index

        entries = record_index.entries_from_written_files(
            self.table, stats, instant)
        if entries is not None:
            entries = entries.persist()
            entries.count()  # materialize pre-lock
        has_dels = dels is not None and bool(dels.limit(1).count())

        def fn():
            try:
                if entries is not None:
                    record_index.append_entries(self.table, entries)
            finally:
                if entries is not None:
                    entries.unpersist()
            if has_dels:
                record_index.append_removals(self.table, dels, instant)

        fn.cleanup = (entries.unpersist if entries is not None else None)
        return fn

    def _commit(self, instant: str, action: str, operation: str, stats: list[dict],
                replaced: dict[str, list[str]] | None = None,
                extra: dict | None = None, index_fn=None) -> WriteResult:
        # re-arm before the commit critical section: the Spark jobs between
        # _begin and here can outlast the expiry on a loaded cluster, and a
        # stale beat would make this LIVE write look reclaimable
        tl.Heartbeat(self.table.base_path).refresh(instant)
        if self.table.write_config.concurrency_mode == WriteConcurrencyMode.OPTIMISTIC:
            from .timeline import LockProvider

            # any exit before index_fn() ran (conflict abort, lock timeout,
            # commit error) must release the pre-lock-materialized index
            # entries or the cached DataFrame leaks for the session lifetime
            invoked = False
            try:
                with LockProvider(self.table.base_path,
                                  self.table.write_config.lock_timeout_s,
                                  self.table.write_config.lock_expiry_s):
                    self._check_conflicts(instant, stats, replaced)
                    if index_fn is not None:
                        invoked = True
                        index_fn()
                    return self._do_commit(instant, action, operation, stats,
                                           replaced, extra)
            except BaseException:
                cleanup = getattr(index_fn, "cleanup", None)
                if not invoked and cleanup is not None:
                    cleanup()
                raise
        if index_fn is not None:
            index_fn()
        return self._do_commit(instant, action, operation, stats, replaced, extra)

    def _check_conflicts(self, instant: str, stats: list[dict],
                         replaced: dict[str, list[str]] | None) -> None:
        """TransactionManager + SimpleConcurrentFileWritesConflictResolution-
        Strategy: abort when a commit that completed after this transaction
        began touched any of the same file groups. On conflict the written
        files are removed (marker-based rollback equivalent — the manifest
        lists exactly what we wrote)."""
        baseline = self._txn_baseline.get(instant, "")
        ours: set[tuple[str, str]] = {(s["partition"], s["file_id"]) for s in stats}
        for pp, fids in (replaced or {}).items():
            ours.update((pp, fid) for fid in fids)
        theirs: set[tuple[str, str]] = set()
        for other in self.table.timeline.completed(tl.DATA_ACTIONS):
            if other.timestamp <= baseline or other.timestamp == instant:
                continue
            md = self.table.timeline.metadata(other)
            for s in md.get("write_stats", []):
                theirs.add((s["partition"], s["file_id"]))
            for pp, fids in md.get("replaced", {}).items():
                theirs.update((pp, fid) for fid in fids)
        overlap = ours & theirs
        if overlap:
            self._abort_write(instant, stats)
            raise WriteConflictError(
                f"instant {instant} conflicts on file groups "
                f"{sorted(overlap)[:5]} with a commit after {baseline}")

    def _abort_write(self, instant: str, stats: list[dict]) -> None:
        """Remove a not-yet-published instant's files + timeline markers
        (marker-based rollback equivalent — the manifest lists exactly what
        we wrote). Used by the OCC conflict abort and failed pre-commit
        validation."""
        fs = self.table.storage
        for s in stats:
            p = os.path.join(self.table.base_path, s["path"])
            if not os.path.isabs(s["path"]) and fs.exists(p):
                fs.remove(p)
        # bloom sketches may have been harvested already — drop the aborted
        # instant's sidecar so no junk accumulates
        from . import bloom
        bloom.drop_sidecar(self.table, instant)
        for state in (tl.REQUESTED, tl.INFLIGHT):
            for act in tl.DATA_ACTIONS:
                self.table.timeline.delete_instant(
                    tl.Instant(instant, act, state))
        self._stop_heartbeat(instant)

    def _do_commit(self, instant: str, action: str, operation: str,
                   stats: list[dict],
                   replaced: dict[str, list[str]] | None = None,
                   extra: dict | None = None) -> WriteResult:
        total_bytes = sum(s.get("size", 0) for s in stats)
        total_recs = sum(s.get("num_records", 0) for s in stats)
        merged_extra = dict(self.commit_extra)
        self.commit_extra = {}
        merged_extra.update(extra or {})
        meta = {
            "operation": operation,
            "write_stats": stats,
            "replaced": replaced or {},
            "schema": self.table.config.schema_json,
            "avg_record_size": int(total_bytes / total_recs) if total_recs else None,
            "extra": merged_extra,
        }
        validators = self.table.write_config.pre_commit_validators
        if validators:
            # the would-be post state: the manifest fold + this commit's
            # metadata overlaid — nothing on the timeline yet, so a failed
            # gate aborts with readers never having seen the write
            from .validators import PreCommitContext
            post_view = self.table.view()
            post_view.apply_pending(instant, meta)
            ctx = PreCommitContext(self.table, instant, stats, post_view)
            try:
                for v in validators:
                    v(ctx)
            except BaseException:
                self._abort_write(instant, stats)
                raise
        self.table.timeline.complete(action, instant, meta)
        self._stop_heartbeat(instant)
        self.table.save_properties()
        if total_recs:
            self.table.write_config.record_size_estimate = max(
                8, int(total_bytes / total_recs))
        self._fire_commit_callbacks(instant, operation, stats)
        self._maintain_secondary_indexes(instant, stats)
        return WriteResult(instant, operation, stats)

    def _maintain_secondary_indexes(self, instant: str,
                                    stats: list[dict]) -> None:
        """Post-publish secondary-index upkeep. A failure here must not
        fail the (already published) commit, but a silently-stale index
        would cause FALSE NEGATIVES on lookups — so on error the affected
        indexes are invalidated (marker dropped) and a warning logged."""
        from . import secondary_index
        cols = secondary_index.indexed_columns(self.table)
        if not cols:
            return
        try:
            secondary_index.append_entries_for_stats(self.table, stats,
                                                     instant)
        except Exception as e:  # noqa: BLE001
            import logging
            for c in cols:
                secondary_index.drop_index(self.table, c)
            logging.getLogger(__name__).warning(
                "secondary index maintenance failed (%s); dropped indexes "
                "%s — recreate with create_index()", e, cols)

    def _fire_commit_callbacks(self, instant: str, operation: str,
                               stats: list[dict]) -> None:
        """HoodieWriteCommitCallback.call — invoked after a successful
        publish with the HoodieWriteCommitCallbackMessage fields."""
        cbs = self.table.write_config.commit_callbacks
        if not cbs:
            return
        msg = {"commit_time": instant,
               "table_name": self.table.config.name,
               "base_path": self.table.base_path,
               "operation": operation,
               "write_stats": stats}
        for cb in cbs:
            try:
                cb(msg)
            except Exception:
                if self.table.write_config.callback_on_commit_error == "raise":
                    raise
                import logging
                logging.getLogger(__name__).warning(
                    "commit callback %r failed for %s", cb, instant,
                    exc_info=True)

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Key generation + schema evolution + column alignment."""
        df = with_keys(df, self.table.config)
        self.table.evolve_schema(df)
        data_cols = self.table.data_columns()
        aligned = []
        for name, dtype in data_cols:
            if name in df.columns:
                aligned.append(F.col(name).cast(dtype).alias(name))
            else:
                aligned.append(F.lit(None).cast(dtype).alias(name))
        return df.select(F.col(RECORD_KEY), F.col(PARTITION_PATH), *aligned)

    def _ord_col(self, df: DataFrame):
        pre = self.table.config.precombine_field
        if not pre:
            return F.lit(0)
        if pre in df.columns:
            return F.col(pre)
        # precombine column absent (key-only delete): typed null so unions
        # against stored rows line up; HARD ranks above ORD so deletes win
        schema = self.table.schema
        if schema is not None and pre in schema.fieldNames():
            return F.lit(None).cast(schema[pre].dataType)
        return F.lit(0)

    def _dedup(self, df: DataFrame, global_index: bool | None = None) -> DataFrame:
        """preCombine (SparkWriteHelper.java:50): keep max-ordering row per
        key — a window, shuffled once by key, no reduceByKey needed."""
        if global_index is None:
            global_index = self.table.global_index
        keys = [RECORD_KEY] if global_index else [PARTITION_PATH, RECORD_KEY]
        w = Window.partitionBy(*keys).orderBy(F.desc_nulls_last(ORD), F.desc(COMMIT_SEQNO_TIEBREAK))
        return (df.withColumn(ORD, self._ord_col(df))
                .withColumn(COMMIT_SEQNO_TIEBREAK, F.monotonically_increasing_id())
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn", ORD, COMMIT_SEQNO_TIEBREAK))

    def _stamp_meta(self, df: DataFrame, instant: str, kind: str = "base") -> DataFrame:
        """Attach the five meta columns (HoodieRecord.java:37-41) and the
        physical __pp dir column; FILE_NAME derives from BUCKET."""
        name = base_file_name(F.col(BUCKET), instant) if kind == "base" \
            else delta_file_name(F.col(BUCKET), instant)
        out = (df.withColumn(COMMIT_TIME, F.lit(instant))
               .withColumn(COMMIT_SEQNO,
                           F.concat_ws("_", F.lit(instant),
                                       F.spark_partition_id().cast("string"),
                                       F.monotonically_increasing_id().cast("string")))
               .withColumn(FILE_NAME, name))
        return self._finalize_cols(out)

    def _finalize_cols(self, df: DataFrame) -> DataFrame:
        data_cols = [n for n, _ in self.table.data_columns()]
        keep = META_COLUMNS + data_cols + [c for c in (OPERATION,) if c in df.columns]
        extras = [c for c in (KIND, BUCKET, OP, ORD, INCOMING, HARD) if c in df.columns]
        out = df.select(*keep, *extras)
        return out.withColumn(
            PP, F.when(F.col(PARTITION_PATH) == "", F.lit(NO_PARTITION))
                 .otherwise(F.col(PARTITION_PATH)))

    # --------------------------------------------------- upsert/insert/delete
    def _upsert_like(self, df: DataFrame, operation: str) -> WriteResult:
        cfg = self.table.config
        wcfg = self.table.write_config
        is_mor = cfg.table_type == TableType.MERGE_ON_READ
        # delete by key without the partition source columns → global lookup
        # (GlobalDeleteKeyGenerator semantics)
        from .keygen import partition_resolvable
        force_global = (operation == WriteOperation.DELETE
                        and not partition_resolvable(df, cfg))
        self._ensure_index_ready()
        # begin the txn BEFORE the view snapshot + tagging + profiling: a
        # commit landing during planning must be above the OCC baseline
        action = tl.DELTACOMMIT if is_mor else tl.COMMIT
        instant = self._begin(action)
        try:
            prepared = self._prepare(df).withColumn(ORD, self._ord_col(df))
            if operation == WriteOperation.DELETE:
                prepared = prepared.withColumn(OP, F.lit("D")).withColumn(HARD, F.lit(1))
            elif IS_DELETED in df.columns:
                prepared = prepared.withColumn(
                    OP, F.when(F.col(IS_DELETED) == True, F.lit("D")).otherwise(F.lit("U")))  # noqa: E712
                prepared = prepared.withColumn(HARD, F.lit(0))
            else:
                prepared = prepared.withColumn(OP, F.lit("U")).withColumn(HARD, F.lit(0))
            if wcfg.combine_before_upsert and operation != WriteOperation.INSERT:
                prepared = self._dedup_keep_op(prepared)

            view = self.table.view()
            use_bucket = wcfg.index_type == IndexType.BUCKET
            if operation == WriteOperation.INSERT and not use_bucket:
                tagged = prepared.withColumn("_target_file_id", F.lit(None).cast("string")) \
                                 .withColumn("_target_pp", F.lit(None).cast("string")) \
                                 .withColumn("_target_base_instant", F.lit(None).cast("string"))
                # pure projection over the source (no index join to save):
                # caching it materializes every column while the profile /
                # packed-group passes are column-pruned — same measured
                # trade as bulk_insert; only the write job needs full width
                pinned = False
            else:
                # bucket index tags INSERTs too: rows for an existing bucket
                # group must merge into it (the group IS the index)
                tagged = tag_location(self.spark, prepared, self.table, view=view,
                                      force_global=force_global)
                # the tagging join against the table index is worth running
                # once, not once per consuming action
                pinned = True
            # global index: update the record in its existing partition
            tagged = tagged.withColumn(
                PARTITION_PATH, F.coalesce(F.col("_target_pp"), F.col(PARTITION_PATH)))
            if pinned:
                tagged = tagged.persist()
            try:
                updates = tagged.filter(F.col("_target_file_id").isNotNull()) \
                                .withColumn(BUCKET, F.col("_target_file_id"))
                inserts = tagged.filter(F.col("_target_file_id").isNull()) \
                                .filter(F.col(OP) != "D")  # deletes of absent keys are no-ops

                # ---- ONE profiling action (workload profile,
                # BaseSparkCommitActionExecutor.java:135): per-(partition,
                # target-file, is-delete) counts give the insert counts, the
                # affected update groups, AND the per-file update stats without
                # three separate collects over the tagged batch
                profile = tagged.groupBy(
                    PARTITION_PATH, "_target_file_id",
                    (F.col(OP) == "D").alias("__isdel")).count().collect()
                insert_counts: dict[str, int] = {}
                affected_updates: dict[tuple[str, str], int] = {}
                for pp, fid, isdel, n in profile:
                    if fid is None:
                        if not isdel:  # deletes of absent keys are no-ops
                            insert_counts[pp] = insert_counts.get(pp, 0) + n
                    else:
                        key = (pp, fid)
                        affected_updates[key] = affected_updates.get(key, 0) + n
                pack_small = not is_mor
                if use_bucket and "__bucket_fid" in tagged.columns:
                    # fixed routing: each insert creates (or joins) its bucket's
                    # file group; no small-file packing, no planner
                    plan = None
                    inserts = inserts.withColumn(BUCKET, F.col("__bucket_fid")) \
                                     .withColumn("__is_new", F.lit(True))
                else:
                    plan, _n_new = self._plan_insert_buckets(
                        view, insert_counts, pack_small)
                if plan is None:
                    pass  # bucket routing already assigned
                elif plan:
                    plan_df = F.broadcast(self.spark.createDataFrame(
                        plan, "pp string, lo double, hi double, file_id string, is_new boolean"))
                    u = (F.pmod(F.xxhash64(F.col(RECORD_KEY)), F.lit(1_000_000)) / 1_000_000.0)
                    inserts = (inserts.withColumn("__u", u)
                               .join(plan_df, (F.col(PARTITION_PATH) == F.col("pp")) &
                                     (F.col("__u") >= F.col("lo")) & (F.col("__u") < F.col("hi")),
                                     "left")
                               .withColumn(BUCKET, F.col("file_id"))
                               .withColumn("__is_new", F.coalesce(F.col("is_new"), F.lit(True)))
                               .drop("pp", "lo", "hi", "file_id", "is_new", "__u"))
                else:
                    inserts = inserts.withColumn(BUCKET, F.lit(None).cast("string")) \
                                     .withColumn("__is_new", F.lit(True))

                emptied: dict[str, list[str]] = {}
                if is_mor:
                    stats = self._write_mor(updates, inserts, view, instant)
                else:
                    stats, emptied = self._write_cow(updates, inserts, view,
                                                     instant, affected_updates)
                dels = None
                if wcfg.record_index:
                    dels = tagged.filter((F.col(OP) == "D") &
                                         F.col("_target_file_id").isNotNull()) \
                                 .select(RECORD_KEY, PARTITION_PATH)
                n_upd = sum(s.get("num_updates", 0) for s in stats)
                return self._commit(instant, action, operation, stats,
                                    replaced=emptied or None,
                                    extra={"num_updates": n_upd},
                                    index_fn=self._index_fn(stats, instant, dels))
            finally:
                if pinned:
                    tagged.unpersist()

        except BaseException:
            self._hb_abandon(instant)
            raise
    def _dedup_keep_op(self, df: DataFrame) -> DataFrame:
        keys = [RECORD_KEY] if self.table.global_index else [PARTITION_PATH, RECORD_KEY]
        w = Window.partitionBy(*keys).orderBy(F.desc_nulls_last(ORD), F.desc("__mono"))
        return (df.withColumn("__mono", F.monotonically_increasing_id())
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1).drop("__rn", "__mono"))

    def _plan_insert_buckets(self, view: FileSystemView, insert_counts: dict[str, int],
                             pack_small: bool):
        """Greedy small-file bin packing on the driver from manifest stats
        (UpsertPartitioner.java:157-214). Returns ([(pp, lo, hi, file_id,
        is_new)], n_new_files): capacity-weighted hash ranges so record→bucket
        assignment is a pure function of the record key (deterministic, no
        extra shuffle beyond the final bucket repartition)."""
        wcfg = self.table.write_config
        rpf = wcfg.records_per_file()
        rec_size = max(8, wcfg.record_size_estimate)
        plan = []
        n_new_total = 0
        for pp, n in sorted(insert_counts.items()):
            if n == 0:
                continue
            buckets: list[tuple[str, int, bool]] = []  # (file_id, capacity, is_new)
            if pack_small:
                for sl in view.latest_slices(partitions=[pp]):
                    bf = sl.base_file
                    if bf is not None and not sl.log_files and \
                            bf.size < wcfg.parquet_small_file_limit and bf.size > 0:
                        cap = int((wcfg.parquet_max_file_size - bf.size) / rec_size)
                        if cap > 0:
                            buckets.append((sl.file_id, cap, False))
            small_cap = sum(c for _, c, _ in buckets)
            remaining = max(0, n - small_cap)
            n_new = math.ceil(remaining / rpf) if remaining > 0 else 0
            if not buckets and n_new == 0:
                n_new = 1
            for _ in range(n_new):
                buckets.append((uuid.uuid4().hex[:13] + "-0", rpf, True))
            n_new_total += n_new
            total = sum(c for _, c, _ in buckets)
            acc = 0.0
            for i, (fid, cap, is_new) in enumerate(buckets):
                lo = acc
                acc = 1.0 if i == len(buckets) - 1 else acc + cap / total
                plan.append((pp, lo, acc, fid, is_new))
        return plan, n_new_total

    # ------------------------------------------------------------- COW merge
    def _write_cow(self, updates: DataFrame, inserts: DataFrame,
                   view: FileSystemView, instant: str,
                   affected_updates: dict[tuple[str, str], int]) -> list[dict]:
        """HoodieMergeHandle.java:89 as a DataFrame program: affected file
        groups = update targets ∪ small-file insert targets; read their latest
        base files, union with incoming, resolve per-key winners (payload),
        rewrite each group as a new file slice. Untouched groups see zero IO.
        ``affected_updates`` comes from the single profiling action."""
        packed = inserts.filter(~F.col("__is_new"))
        new_rows = inserts.filter(F.col("__is_new"))

        affected = list(affected_updates)
        affected += [tuple(r) for r in
                     packed.select(PARTITION_PATH, BUCKET).distinct().collect()]
        slices = view.slices_for_groups(set(affected))
        old = self.table.read_slices_base(slices)
        old = (old.withColumn(BUCKET, F.split(F.col(FILE_NAME), "_").getItem(0))
                  .withColumn(ORD, self._ord_col(old))
                  .withColumn(OP, F.lit("O"))
                  .withColumn(INCOMING, F.lit(0))
                  .withColumn(HARD, F.lit(0)))
        incoming = updates.unionByName(packed.drop("__is_new"), allowMissingColumns=True) \
                          .drop("_target_file_id", "_target_pp", "_target_base_instant",
                                "__is_new")
        incoming = self._stamp_meta(incoming.withColumn(INCOMING, F.lit(1)), instant)
        old = self._finalize_cols(old).withColumn(
            FILE_NAME, base_file_name(F.col(BUCKET), instant))

        merged = self._merge(old, incoming)
        new_stamped = self._stamp_meta(new_rows.filter(F.col(OP) != "D"), instant)
        write_df = merged.unionByName(new_stamped.select(*merged.columns)) \
                         .withColumn(KIND, F.lit("base"))
        stats = self._write_files(write_df, instant, sort_cols=[RECORD_KEY])
        for s in stats:
            s["num_updates"] = affected_updates.get(
                (s["partition"], s["file_id"]), 0)
        # a rewrite that produced no rows leaves no file — mark the group
        # replaced so the old slice doesn't stay latest (full-group delete)
        written = {(s["partition"], s["file_id"]) for s in stats}
        emptied: dict[str, list[str]] = {}
        for pp, fid in affected:
            if (pp, fid) not in written:
                emptied.setdefault(pp, []).append(fid)
        return stats, emptied

    def _merge(self, old: DataFrame, incoming: DataFrame) -> DataFrame:
        """Payload resolution (HoodieRecordPayload.combineAndGetUpdateValue).
        old/incoming both carry META + data + PP/BUCKET/OP/ORD/INCOMING."""
        policy = self.table.write_config.merge_policy or self.table.config.payload
        cols = [c for c in old.columns]
        incoming = incoming.withColumn(ORD, self._ord_col(incoming)) \
            if ORD not in incoming.columns else incoming
        inc = incoming.select(*cols)
        if policy == MergePolicy.PARTIAL_UPDATE:
            return self._merge_partial(old, inc)
        unioned = old.unionByName(inc)
        if policy == MergePolicy.DEFAULT:
            # DefaultHoodieRecordPayload: incoming must beat the STORED
            # record's ordering too (needUpdatingPersistedRecord:93)
            order = [F.desc(HARD), F.desc_nulls_last(ORD), F.desc(INCOMING)]
        else:
            # OverwriteWithLatestAvroPayload.java:50-52: ordering only dedups
            # within the batch; vs storage, incoming always wins
            order = [F.desc(HARD), F.desc(INCOMING), F.desc_nulls_last(ORD)]
        w = Window.partitionBy(PP, RECORD_KEY).orderBy(*order)
        return (unioned.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .filter(F.col(OP) != "D")
                .drop("__rn", OP, ORD, INCOMING, HARD))

    def _merge_partial(self, old: DataFrame, inc: DataFrame) -> DataFrame:
        """OverwriteNonDefaultsWithLatestAvroPayload.java: null incoming
        fields keep the stored value; full-outer join + per-column coalesce."""
        o = old.alias("o")
        i = inc.alias("i")
        cond = (F.col(f"o.{PP}") == F.col(f"i.{PP}")) & \
               (F.col(f"o.{RECORD_KEY}") == F.col(f"i.{RECORD_KEY}"))
        j = o.join(i, cond, "full_outer")
        inc_wins = F.col(f"i.{RECORD_KEY}").isNotNull() & (
            (F.col(f"i.{HARD}") == 1) | F.col(f"o.{RECORD_KEY}").isNull() |
            (F.col(f"i.{ORD}") >= F.col(f"o.{ORD}")) | F.col(f"o.{ORD}").isNull())
        data_cols = [n for n, _ in self.table.data_columns()]
        sel = []
        for c in old.columns:
            if c in (OP, ORD, INCOMING, HARD):
                continue
            if c in data_cols:
                sel.append(F.when(inc_wins, F.coalesce(F.col(f"i.{c}"), F.col(f"o.{c}")))
                           .otherwise(F.col(f"o.{c}")).alias(c))
            else:
                sel.append(F.when(inc_wins, F.coalesce(F.col(f"i.{c}"), F.col(f"o.{c}")))
                           .otherwise(F.coalesce(F.col(f"o.{c}"), F.col(f"i.{c}"))).alias(c))
        deleted = inc_wins & (F.col(f"i.{OP}") == "D")
        return j.filter(~deleted).select(*sel)

    # ------------------------------------------------------------- MOR write
    def _write_mor(self, updates: DataFrame, inserts: DataFrame,
                   view: FileSystemView, instant: str) -> list[dict]:
        """HoodieAppendHandle.java:71 — updates/deletes append columnar delta
        files to their file slice (Avro log blocks replaced with small Parquet
        deltas — columnar, splittable, idiomatic); inserts create new base
        files. One job writes both via the KIND partition column."""
        upd = updates.drop("_target_file_id", "_target_pp", "_target_base_instant")
        upd = self._stamp_meta(upd.withColumn(OPERATION, F.col(OP)), instant, kind="delta") \
                  .withColumn(KIND, F.lit("delta"))
        new_rows = inserts.filter(F.col(OP) != "D") \
            .drop("_target_file_id", "_target_pp", "_target_base_instant", "__is_new")
        new_rows = self._stamp_meta(new_rows.withColumn(OPERATION, F.lit("I")), instant) \
                       .withColumn(KIND, F.lit("base"))
        write_df = upd.unionByName(new_rows.select(*upd.columns))
        stats = self._write_files(write_df, instant, sort_cols=[RECORD_KEY])
        base_of = {(sl.partition, sl.file_id): sl.base_instant
                   for sl in view.latest_slices()}
        for s in stats:
            if s["is_delta"]:
                s["base_instant"] = base_of.get((s["partition"], s["file_id"]),
                                                instant)
                s["num_updates"] = s["num_records"]
        return stats

    # ------------------------------------------------------------- overwrite
    def _overwrite(self, df: DataFrame, operation: str) -> WriteResult:
        self._ensure_index_ready()
        instant = self._begin(tl.REPLACECOMMIT)
        try:
            prepared = self._prepare(df)
            # cached across the sizing count and the write only when the
            # combine dedup ran (same measured trade as bulk_insert: the
            # cache build costs more than the column-pruned count it saves
            # on the plain projection shape)
            pinned = self.table.write_config.combine_before_insert
            if pinned:
                prepared = self._dedup(prepared).persist()
            try:
                n = prepared.count()
                view = self.table.view()
                stats: list[dict] = []
                touched: list[str] = []
                if n > 0:
                    if self.table.write_config.index_type == IndexType.BUCKET:
                        # overwrites must stay on the bucket layout: the key→
                        # file-group hash IS the index, so replacement groups
                        # carry bucket fids, never planner uuids
                        from .index import bucket_fid_expr
                        fid = bucket_fid_expr(
                            self.table.write_config.bucket_index_num_buckets)
                        arranged = (prepared
                                    .repartition(F.col(PARTITION_PATH), fid)
                                    .withColumn(BUCKET, fid))
                    else:
                        rpf = self.table.write_config.records_per_file()
                        num_files = max(1, math.ceil(n / rpf))
                        prefix = uuid.uuid4().hex[:13]
                        arranged = (prepared
                                    .repartitionByRange(num_files, F.col(PARTITION_PATH), F.col(RECORD_KEY))
                                    .withColumn(BUCKET, F.concat(F.lit(prefix + "-"),
                                                                 F.spark_partition_id().cast("string"))))
                    write_df = self._stamp_meta(arranged, instant).withColumn(KIND, F.lit("base"))
                    stats = self._write_files(write_df, instant, already_partitioned=True,
                                              sort_cols=[RECORD_KEY])
                    touched = sorted({s["partition"] for s in stats})
                if operation == WriteOperation.INSERT_OVERWRITE_TABLE:
                    replaced = view.live_group_ids()
                else:
                    replaced = view.live_group_ids(partitions=touched)
                return self._commit(instant, tl.REPLACECOMMIT, operation, stats,
                                    replaced=replaced,
                                    index_fn=self._index_fn(stats, instant))
            finally:
                if pinned:
                    prepared.unpersist()

        except BaseException:
            self._hb_abandon(instant)
            raise
    # ------------------------------------------------------- record index
    def _index_written(self, stats: list[dict], instant: str) -> None:
        """Maintain the record-level index from the just-written base files
        (opt-in). Ground truth comes from storage, so the index can't drift."""
        if not self.table.write_config.record_index:
            return
        from . import record_index
        record_index.append_from_written_files(self.table, stats, instant)

    # ----------------------------------------------------------- file writer
    def _write_files(self, df: DataFrame, instant: str, *, already_partitioned=False,
                     sort_cols=None) -> list[dict]:
        """The single physical write: partitionBy(__pp, __kind, __bucket) into
        a temp dir, then driver renames part-files to
        ``fileId_writeToken_instant.parquet`` (FSUtils.java:131 naming) and
        harvests footer stats. Exactly one part-file per bucket because the
        bucket column is the (only) repartition key."""
        tmp = os.path.join(self.table.base_path, ".hoodie", ".temp", instant)
        internal = [c for c in df.columns
                    if c in (OP, ORD, INCOMING, HARD, "__is_new", "__u") or
                    c.startswith("_target_")]
        w = df.drop(*internal)
        if not already_partitioned:
            w = w.repartition(F.col(PP), F.col(BUCKET))
        if sort_cols:
            w = w.sortWithinPartitions(PP, BUCKET, *sort_cols)
        w.write.partitionBy(PP, KIND, BUCKET).mode("overwrite").parquet(tmp)

        # all directory mutations below go through the Storage seam
        # (FSUtils/HoodieWrapperFileSystem equivalent) so an object-store
        # backend swaps in without touching the write path
        fs = self.table.storage
        moves: list[tuple[str, str, str, str, str]] = []  # (pp, fid, kind, src, dst)
        for pp_dir in fs.listdir(tmp):
            if not pp_dir.startswith(f"{PP}="):
                continue
            pp_enc = pp_dir[len(PP) + 1:]
            pp = urllib.parse.unquote(pp_enc)
            pp = "" if pp == NO_PARTITION else pp
            dst_dir = os.path.join(self.table.base_path, pp) if pp else self.table.base_path
            fs.makedirs(dst_dir)
            for kind_dir in fs.listdir(os.path.join(tmp, pp_dir)):
                kind = kind_dir.split("=", 1)[1]
                kdir = os.path.join(tmp, pp_dir, kind_dir)
                for bucket_dir in fs.listdir(kdir):
                    fid = urllib.parse.unquote(bucket_dir.split("=", 1)[1])
                    parts = [f for f in fs.listdir(os.path.join(kdir, bucket_dir))
                             if f.endswith(".parquet")]
                    assert len(parts) == 1, f"expected 1 file per bucket, got {parts}"
                    src = os.path.join(kdir, bucket_dir, parts[0])
                    if kind == "base":
                        fname = f"{fid}_{WRITE_TOKEN}_{instant}.parquet"
                    else:
                        fname = f"{fid}_{instant}.delta.parquet"
                    moves.append((pp, fid, kind, src, os.path.join(dst_dir, fname)))

        # finalize (rename + footer harvest) is threaded: the per-file driver
        # work is O(files)/16 wall-clock, not a serial commit tail
        from concurrent.futures import ThreadPoolExecutor

        stats_cols = self.table.write_config.stats_columns

        def _finalize(m):
            _pp, _fid, _kind, src_p, dst_p = m
            fs.rename(src_p, dst_p)
            return _footer_stats(dst_p, stats_cols)

        with ThreadPoolExecutor(max_workers=min(16, max(1, len(moves)))) as ex:
            footers = list(ex.map(_finalize, moves))
        placed = [(pp, fid, kind, dst) for pp, fid, kind, _src, dst in moves]
        stats: list[dict] = []
        for (pp, fid, kind, dst), st in zip(placed, footers):
            fname = os.path.basename(dst)
            rec = {
                "partition": pp, "file_id": fid, "file_name": fname,
                "path": os.path.join(pp, fname) if pp else fname,
                "instant": instant, "size": fs.size(dst),
                "num_records": st["num_records"],
                "min_key": st["min_key"], "max_key": st["max_key"],
                "is_delta": kind != "base",
            }
            if st.get("col_stats"):
                rec["col_stats"] = st["col_stats"]
            stats.append(rec)
        fs.rmtree(tmp)
        wc = self.table.write_config
        if wc.bloom_harvest_on_write and wc.index_type in (
                IndexType.BLOOM, IndexType.GLOBAL_BLOOM):
            from . import bloom
            bloom.harvest(self.table, stats, instant)
        if wc.stats_exprs:
            self._harvest_expr_stats(stats, wc.stats_exprs)
        return stats

    def _harvest_expr_stats(self, stats: list[dict], exprs: dict) -> None:
        """Functional-index equivalent (public Hudi-1.0 expression-index
        design; beyond this reference snapshot): per-file min/max of each
        configured SQL expression over this commit's BASE files, folded
        into the manifest ``col_stats`` under the alias so
        ``skip_filters=[(alias, op, v)]`` prunes files. One column-pruned
        Spark job per commit — opt-in via ``WriteConfig.stats_exprs``.
        Driver data is bounded: one row per written file."""
        paths = [os.path.join(self.table.base_path, s["path"])
                 for s in stats if not s["is_delta"]]
        if not paths:
            return
        df = self.spark.read.parquet(*paths).withColumn(
            "__f", F.input_file_name())
        aggs = []
        for alias, expr in exprs.items():
            aggs += [F.min(F.expr(expr)).alias(f"mn_{alias}"),
                     F.max(F.expr(expr)).alias(f"mx_{alias}")]
        # key by the partition-qualified relative path, NOT the basename:
        # bucket-index tables write identically named base files
        # (fid_token_instant.parquet) in several partitions within one
        # commit, and a basename key would record one partition's min/max
        # as every same-named file's col_stats (skip_filters could then
        # prune a file that does contain matching rows)
        from .storage import relpath_from_uri
        base = self.table.base_path
        by_path = {relpath_from_uri(r["__f"], base): r
                   for r in df.groupBy("__f").agg(*aggs).collect()}
        for s in stats:
            r = by_path.get(s["path"])
            if r is None:
                continue
            cs = s.setdefault("col_stats", {})
            for alias in exprs:
                mn, mx = r[f"mn_{alias}"], r[f"mx_{alias}"]
                if mn is None or isinstance(mn, bool) or \
                        not isinstance(mn, (int, float, str)):
                    continue
                cs[alias] = [mn, mx]


COMMIT_SEQNO_TIEBREAK = "__seqno_tb"


def _footer_stats(path: str, stats_columns: list[str] | None = None) -> dict:
    """Record count + record-key min/max straight from the parquet footer
    (the rebuild's stand-in for Hudi's bloom/range metadata written to
    footers — SparkHoodieBloomIndex.java:119 loads the same stats). With
    ``stats_columns``, also harvests per-column min/max for data skipping
    (column-stats-index equivalent); only JSON-safe numeric/string stats are
    kept."""
    md = pq.ParquetFile(path).metadata
    want = set(stats_columns or [])
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    min_k = max_k = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name != RECORD_KEY and name not in want:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    continue
            if name == RECORD_KEY:
                min_k = mn if min_k is None else min(min_k, mn)
                max_k = mx if max_k is None else max(max_k, mx)
            elif isinstance(mn, (int, float, str)) and not isinstance(mn, bool):
                mins[name] = mn if name not in mins else min(mins[name], mn)
                maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    out = {"num_records": md.num_rows, "min_key": min_k, "max_key": max_k}
    if mins:
        out["col_stats"] = {c: [mins[c], maxs[c]] for c in mins}
    return out
