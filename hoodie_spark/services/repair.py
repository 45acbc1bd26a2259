"""Repairs: surgical fixes for tables damaged by writer bugs.

Reference parity: hudi-cli RepairsCommand.java (``repair deduplicate``) and
its Spark job DedupeSparkJob.scala — a partition that accumulated duplicate
record keys (e.g. a non-global index miss after a partition-value change,
or a pre-heartbeat failed write that published twice) is rewritten keeping
exactly one row per key.

Spark-first shape: the duplicate scan and the winner selection are one
windowed DataFrame job over the affected partition only — never the whole
table — and the rewrite reuses insert_overwrite, so the fix is itself an
atomic replacecommit with full rollback/time-travel semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..config import COMMIT_SEQNO, COMMIT_TIME, META_COLUMNS, RECORD_KEY


def find_duplicates(table, partition: str):
    """Record keys appearing more than once in the partition's snapshot.
    Returns a DataFrame(_hoodie_record_key, dup_count) — driver collects
    nothing; callers decide."""
    snap = table.snapshot(partitions=[partition])
    return (snap.groupBy(RECORD_KEY)
            .agg(F.count(F.lit(1)).alias("dup_count"))
            .filter(F.col("dup_count") > 1))


def repair_deduplicate(table, partition: str, dry_run: bool = False):
    """Rewrite ``partition`` keeping, per duplicated key, the row with the
    greatest (precombine, commit time) — the same winner an upsert would
    have produced. Non-duplicated rows pass through untouched. Returns the
    replacecommit instant, or None when the partition is already clean (or
    on dry_run, the duplicate count)."""
    n_dups = find_duplicates(table, partition).count()
    if dry_run or n_dups == 0:
        return n_dups if dry_run else None
    snap = table.snapshot(partitions=[partition])
    # seqno last: a unique per-row tiebreak so equal (precombine, commit)
    # duplicates repair identically on every run
    order = [F.col(COMMIT_TIME).desc(), F.col(COMMIT_SEQNO).desc()]
    pre = table.config.precombine_field
    if pre:
        order.insert(0, F.col(pre).desc())
    w = Window.partitionBy(RECORD_KEY).orderBy(*order)
    fixed = (snap.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .drop("__rn", *META_COLUMNS))
    res = table.insert_overwrite(fixed)
    return res.instant
