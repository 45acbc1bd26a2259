"""Round-8 advisor regression tests: archive durability ordering (record
fsync'd before the active instant file is deleted), torn-tail tolerance in
the archive readers, and lock-release failures not masking body exceptions.

Reference parity: HoodieTimelineArchiveLog.java (archive-then-delete
ordering), HoodieActiveTimeline.java:149 (atomic instant transitions).
"""

import json
import os

import pytest

from hoodie_spark import HoodieTable
from hoodie_spark.services.repair import find_orphan_files

SF_DIR = "/root/testdata/sf0.001"


def _make_table_with_commits(spark, orders, path, n_commits=6):
    tbl = HoodieTable.create(spark, path, "arch_t", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders.limit(100))
    upd = orders.limit(20)
    for _ in range(n_commits - 1):
        tbl.upsert(upd)
    return tbl


def test_archive_record_durable_before_active_delete(spark, orders,
                                                     tmp_table_path):
    """At the moment delete_instant runs, the archive file on disk must
    already contain a COMPLETE JSON record for that instant — a concurrent
    reader (orphan repair) or a crash right here must find the instant in
    at least one of the two places."""
    tbl = _make_table_with_commits(spark, orders, tmp_table_path)
    tl = tbl.timeline
    seen_at_delete = []
    orig_delete = tl.delete_instant

    def checked_delete(inst):
        # the chunk is published atomically BEFORE any delete runs, so at
        # this moment every moved instant must already be readable through
        # the archive
        recs = list(tl.archived_records())
        seen_at_delete.append(
            any(r["timestamp"] == inst.timestamp for r in recs))
        return orig_delete(inst)

    tl.delete_instant = checked_delete
    try:
        moved = tbl.archive(max_active=2)
    finally:
        tl.delete_instant = orig_delete
    assert moved >= 2
    assert seen_at_delete and all(seen_at_delete), \
        "active instant deleted before its archive record was durable"


def test_torn_archive_tail_tolerated(spark, orders, tmp_table_path):
    """A partially-written final archive line (crash/concurrent append)
    must not crash the orphan scan or the timeline's archive fallback."""
    tbl = _make_table_with_commits(spark, orders, tmp_table_path)
    assert tbl.archive(max_active=2) >= 2
    tl = tbl.timeline
    # a real archived record is still readable through metadata()
    archived = [i for i in tl.instants(include_archived=True)
                if i not in tl.instants(include_archived=False)]
    with open(tl.archive_path, "a") as f:
        f.write('{"timestamp": "20990101000000", "action": "comm')  # torn
    # orphan scan parses the archive: must skip the torn tail, not raise
    orphans = find_orphan_files(tbl, max_age_s=0.0)
    assert orphans == []
    if archived:
        md = tl.metadata(archived[0])
        assert "write_stats" in md


def test_lock_release_failure_does_not_mask_body_exception(tmp_table_path):
    """A transient store error in delete_if_exists during __exit__ must not
    replace the in-flight exception from the with-block body, and a clean
    body must not see the release error either (lock left for expiry)."""
    from hoodie_spark import storage
    from hoodie_spark.timeline import LockProvider

    os.makedirs(os.path.join(tmp_table_path, ".hoodie"), exist_ok=True)
    orig = storage.ATOMIC.delete_if_exists

    def boom(path):
        raise OSError("transient store delete error")

    storage.ATOMIC.delete_if_exists = boom
    try:
        with pytest.raises(ValueError, match="body failure"):
            with LockProvider(tmp_table_path, timeout_s=1.0):
                raise ValueError("body failure")
        # lock file leaked (release failed) — recoverable by expiry
        assert os.path.exists(
            os.path.join(tmp_table_path, ".hoodie", ".lock"))
        os.remove(os.path.join(tmp_table_path, ".hoodie", ".lock"))
        # clean body: release error is swallowed (logged), not raised
        with LockProvider(tmp_table_path, timeout_s=1.0):
            pass
    finally:
        storage.ATOMIC.delete_if_exists = orig
    os.remove(os.path.join(tmp_table_path, ".hoodie", ".lock"))


def test_archive_with_torn_legacy_file(spark, orders, tmp_table_path):
    """Archiving next to a crash-torn legacy (append-era) archive file
    must neither crash nor lose records: new folds land in write-once
    chunk objects (never appended onto the torn line), the torn legacy
    line is skipped on read, and every archived instant stays readable."""
    tbl = _make_table_with_commits(spark, orders, tmp_table_path)
    tl = tbl.timeline
    with open(tl.archive_path, "w") as f:
        f.write('{"timestamp": "199901010000', )  # torn, no newline
    moved = tbl.archive(max_active=2)
    assert moved >= 2
    # the fold went into a chunk object, not onto the legacy file
    assert any(e.startswith("chunk-") for e in os.listdir(tl.archive_dir))
    with open(tl.archive_path) as f:
        assert f.read() == '{"timestamp": "199901010000'  # untouched
    archived = [i for i in tl.instants(include_archived=True)
                if i not in tl.instants(include_archived=False)]
    assert len(archived) == moved
    ts = {r["timestamp"] for r in tl.archived_records()}
    assert all(i.timestamp in ts for i in archived)
    # and the snapshot still folds the archived metadata
    assert tbl.snapshot().count() == 100
