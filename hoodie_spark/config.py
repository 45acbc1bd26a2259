"""Table and write configuration.

Reference parity: ``HoodieTableConfig`` (hudi-common/src/main/java/org/apache/
hudi/common/table/HoodieTableConfig.java) for table-level properties persisted
under the metafolder, and ``HoodieWriteConfig`` / ``HoodieStorageConfig``
(hudi-client/hudi-client-common/.../config/HoodieStorageConfig.java:37-39 —
120 MB target base file, 100 MB small-file limit) for write-time knobs.

The rebuild keeps only the knobs that affect a Catalyst-planned write:
file sizing (bin packing), index mode, merge policy, and sort mode.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


class TableType:
    """common/model/HoodieTableType.java:30."""

    COPY_ON_WRITE = "COPY_ON_WRITE"
    MERGE_ON_READ = "MERGE_ON_READ"


class WriteOperation:
    """common/model/WriteOperationType.java:28-52."""

    INSERT = "insert"
    UPSERT = "upsert"
    BULK_INSERT = "bulk_insert"
    DELETE = "delete"
    DELETE_PARTITION = "delete_partition"
    INSERT_OVERWRITE = "insert_overwrite"
    INSERT_OVERWRITE_TABLE = "insert_overwrite_table"
    CLUSTER = "cluster"
    COMPACT = "compact"
    BOOTSTRAP = "bootstrap"


class WriteConcurrencyMode:
    """common/model/WriteConcurrencyMode.java:30-32."""

    SINGLE_WRITER = "single_writer"
    OPTIMISTIC = "optimistic_concurrency_control"


class BootstrapMode:
    """table/action/bootstrap — METADATA_ONLY registers the existing files
    in a commit (no data rewrite; keys/meta computed on read);
    FULL_RECORD rewrites the source through the bulk-insert path."""

    METADATA_ONLY = "metadata_only"
    FULL_RECORD = "full_record"


class MergePolicy:
    """Named merge policies standing in for HoodieRecordPayload classes.

    OVERWRITE_LATEST  = OverwriteWithLatestAvroPayload.java:38 (latest by
                        ordering value, incoming wins ties)
    DEFAULT           = DefaultHoodieRecordPayload.java:41 (also compares
                        ordering against the *stored* record,
                        needUpdatingPersistedRecord:93)
    PARTIAL_UPDATE    = OverwriteNonDefaultsWithLatestAvroPayload.java
                        (null incoming fields keep the stored value)
    """

    OVERWRITE_LATEST = "overwrite_latest"
    DEFAULT = "default"
    PARTIAL_UPDATE = "partial_update"


class IndexType:
    """hudi-client-common/.../index/HoodieIndex.java:106.

    SIMPLE / GLOBAL_SIMPLE are join-based (SparkHoodieSimpleIndex.java:153);
    BLOOM / GLOBAL_BLOOM add key-range pruning from file stats
    (SparkHoodieBloomIndex.java:110-133) — in the rebuild the range stats
    live in the commit manifests, so "bloom" = manifest min/max pruning
    before the same join.
    """

    SIMPLE = "simple"
    GLOBAL_SIMPLE = "global_simple"
    BLOOM = "bloom"
    GLOBAL_BLOOM = "global_bloom"
    # hash-bucket index (the public HoodieSimpleBucketIndex design; this
    # reference snapshot predates it): record → fixed file group via
    # hash(key) % num_buckets — tagging reads NOTHING
    BUCKET = "bucket"


# Meta columns prepended to every stored row
# (common/model/HoodieRecord.java:37-41).
COMMIT_TIME = "_hoodie_commit_time"
COMMIT_SEQNO = "_hoodie_commit_seqno"
RECORD_KEY = "_hoodie_record_key"
PARTITION_PATH = "_hoodie_partition_path"
FILE_NAME = "_hoodie_file_name"
META_COLUMNS = [COMMIT_TIME, COMMIT_SEQNO, RECORD_KEY, PARTITION_PATH, FILE_NAME]

# Extra column carried only in MOR delta (log) files: 'U' update / 'D' delete.
OPERATION = "_hoodie_operation"

# Soft-delete flag understood by the merge (HoodieTestDataGenerator.java:96).
IS_DELETED = "_hoodie_is_deleted"

# Sentinel used for the partition value of non-partitioned tables.
NO_PARTITION = "__NONE__"


@dataclass
class TableConfig:
    """Persisted to ``<base>/.hoodie/hoodie.properties.json``
    (reference: HoodieTableConfig.java persisted at
    common/table/HoodieTableMetaClient.java:77-81)."""

    name: str
    table_type: str = TableType.COPY_ON_WRITE
    recordkey_fields: list[str] = field(default_factory=list)
    precombine_field: str | None = None
    # Either a list of partition fields (values joined by '/') or a Spark SQL
    # expression producing the partition path string (TimestampBasedKeyGenerator
    # equivalent). Both None => non-partitioned table.
    partition_fields: list[str] | None = None
    partition_expr: str | None = None
    payload: str = MergePolicy.OVERWRITE_LATEST
    # latest schema as StructType.json(); updated on each commit
    schema_json: str | None = None
    # table layout version (services/upgrade.py): v2 = manifests carry
    # per-file record-key ranges. New tables are created at the current
    # version; v1 tables are migrated by services.upgrade.upgrade().
    version: int = 2
    # STRUCTURAL index config, persisted because the data layout depends on
    # it: for a BUCKET-index table the key→file-group hash IS the index, so
    # a session that reloads the table with a different bucket count (or a
    # non-bucket index) would route inserts off-layout and silently
    # duplicate keys. None for tables whose index is a per-session choice
    # (SIMPLE/BLOOM/record-index are lookup strategies, not layout).
    bucket_index_num_buckets: int | None = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "TableConfig":
        return TableConfig(**json.loads(s))

    @property
    def partitioned(self) -> bool:
        return bool(self.partition_fields) or self.partition_expr is not None


@dataclass
class WriteConfig:
    """Write-time knobs (HoodieStorageConfig.java defaults: 120 MB target
    file, 100 MB small-file limit; HoodieCompactionConfig.java:59-108)."""

    parquet_max_file_size: int = 120 * 1024 * 1024
    parquet_small_file_limit: int = 100 * 1024 * 1024
    # bootstrap estimate; refined from observed bytes/record after each commit
    record_size_estimate: int = 1024
    # SIMPLE by default: the bloom sketch pays an extra column-pruned pass
    # over written files, which read-only / append-only workloads never
    # recoup. Opt into BLOOM/GLOBAL_BLOOM for upsert-heavy tables; sketches
    # are then harvested lazily at first tag (see bloom_harvest_on_write).
    index_type: str = IndexType.SIMPLE
    # fixed file groups per partition for IndexType.BUCKET; pick so
    # partition_size / num_buckets ≈ target file size — it cannot be
    # changed after the first write (bucket ↔ file-group mapping is the
    # index)
    bucket_index_num_buckets: int = 8
    merge_policy: str | None = None  # None -> table payload
    combine_before_insert: bool = False
    combine_before_upsert: bool = True
    # table services
    cleaner_commits_retained: int = 10
    min_commits_to_keep: int = 20
    max_commits_to_keep: int = 30
    # MOR
    max_delta_commits_before_compaction: int = 5
    # clustering
    clustering_small_file_limit: int = 50 * 1024 * 1024
    clustering_target_file_size: int = 120 * 1024 * 1024
    # plan strategy: "small_files" (all partitions) or "recent_days"
    # (SparkRecentDaysClusteringPlanStrategy.java:112-122 — only the
    # lexicographically-latest N partitions are even considered, so a
    # date-partitioned 100 TB table plans over days, not years)
    clustering_plan_strategy: str = "small_files"
    clustering_target_partitions: int = 2  # daybased.lookback.partitions
    clustering_max_bytes_in_group: int = 2 * 1024 * 1024 * 1024
    clustering_max_num_groups: int = 30
    # concurrency (§1.6): single-writer by default; optimistic mode takes the
    # table lock at commit and aborts on overlapping file-group writes
    concurrency_mode: str = WriteConcurrencyMode.SINGLE_WRITER
    lock_timeout_s: float = 60.0
    # a lock file untouched for this long belongs to a DEAD writer (live
    # holders finish their commit-critical section in seconds) and is
    # force-reclaimed by the next waiter (FileSystemBasedLockProvider.java
    # LOCK_EXPIRE semantics). Must be generous: reclaiming a live holder's
    # lock breaks mutual exclusion. None disables reclamation.
    lock_expiry_s: float | None = 600.0
    # failed-write cleaning (HoodieFailedWritesCleaningPolicy): "eager"
    # rolls back dead writers' pending instants at the start of every write;
    # "lazy" defers to clean() and only reclaims instants whose heartbeat
    # (.hoodie/.heartbeat/<instant>) has expired — required for
    # multi-writer/OCC, where a pending instant may belong to a LIVE
    # concurrent writer; "never" disables automatic reclamation
    failed_writes_policy: str = "lazy"
    heartbeat_expiry_s: float = 120.0
    # data skipping: harvest per-file min/max for these columns into the
    # commit manifest (column-stats-index equivalent); reads can then prune
    # files via snapshot(skip_filters=...) before Spark ever lists them
    stats_columns: list[str] = field(default_factory=list)
    # expression stats (functional-index equivalent): alias -> SQL expr.
    # Per-file min/max of each expression is harvested at write time and
    # used by skip_filters on the alias. OPT-IN: costs one extra Spark job
    # over the just-written files per commit (same cost class as bloom
    # harvest, which is why neither is on by default). Expressions should
    # evaluate to a numeric or string type.
    stats_exprs: dict = field(default_factory=dict)
    # record-level index (metadata-table record index equivalent): persist a
    # key -> file-group map so upsert tagging joins a compact index instead
    # of scanning data files. Opt-in.
    record_index: bool = False
    record_index_buckets: int = 16
    # bloom sketch cost gate: building + probing a sketch costs ~2 Spark
    # jobs per write, which only pays off when it saves reading the key
    # column of large files. Files below this record count skip the sketch
    # (their key scan is cheaper than the probe); default-sized 120 MB
    # files (~117k records at 1 KB/record) are above it.
    bloom_sketch_min_records: int = 100_000
    # When True, sketches are computed eagerly right after each write (an
    # extra column-pruned Spark job per commit — Hudi folds this into the
    # write by storing blooms in parquet footers). Default False: harvest
    # lazily at the first bloom tag, only for candidate files that survived
    # range pruning, so files never probed are never sketched.
    bloom_harvest_on_write: bool = False
    # write-commit callbacks (HoodieWriteCommitCallback.java:25): callables
    # invoked AFTER an instant publishes, with a message dict
    # {commit_time, table_name, base_path, operation, write_stats}
    # (HoodieWriteCommitCallbackMessage fields). Callbacks fire AFTER the
    # instant has published, so a raised callback error cannot roll the
    # commit back — a caller that treats it as a write failure and retries
    # would double-write. Default 'warn' (log-and-continue), matching the
    # reference's HTTP callback; set 'raise' to propagate instead.
    commit_callbacks: list = field(default_factory=list)
    # pre-publish gates (public SparkPreCommitValidator design; beyond this
    # reference snapshot): callables(ctx) that raise
    # PreCommitValidationError to abort the write BEFORE readers can see it
    pre_commit_validators: list = field(default_factory=list)
    callback_on_commit_error: str = "warn"

    def records_per_file(self) -> int:
        return max(1, self.parquet_max_file_size // max(1, self.record_size_estimate))
