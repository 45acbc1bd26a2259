"""Cleaning: delete file slices no reader can need any more.

Reference parity: HoodieCleaningPolicy.java:24 (KEEP_LATEST_FILE_VERSIONS,
KEEP_LATEST_COMMITS), CleanPlanner.java:68 (savepoint-aware retention),
BaseCleanActionExecutor.

Spark-first: the plan is computed on the driver purely from the manifest
fold (no listing); deletes are O(obsolete files) metadata ops. At cluster
scale the delete loop would be ``sc.parallelize(paths).foreach``; on a
single host plain os.remove is already IO-bound."""

from __future__ import annotations

import os

from .. import timeline as tl
from .rollback import savepointed_files


class CleaningPolicy:
    KEEP_LATEST_COMMITS = "KEEP_LATEST_COMMITS"
    KEEP_LATEST_FILE_VERSIONS = "KEEP_LATEST_FILE_VERSIONS"


def clean(table, policy: str = CleaningPolicy.KEEP_LATEST_COMMITS,
          retained: int | None = None):
    """Returns the clean instant, or None if nothing to do."""
    if table.write_config.failed_writes_policy == "lazy":
        # HoodieFailedWritesCleaningPolicy.LAZY: dead writers' pending
        # instants are reclaimed here, heartbeat-gated so a live concurrent
        # writer's in-flight instant is never touched
        from .rollback import rollback_failed_writes
        rollback_failed_writes(table)
    timeline = table.timeline
    view = table.view()
    pinned = savepointed_files(table)
    retained = retained if retained is not None else \
        table.write_config.cleaner_commits_retained

    earliest_retained = None
    if policy == CleaningPolicy.KEEP_LATEST_COMMITS:
        commits = timeline.completed(tl.DATA_ACTIONS)
        if len(commits) <= retained:
            return None
        earliest_retained = commits[-retained].timestamp

    deleted_slices, deleted_logs, deleted_paths = [], [], []
    # FILE_VERSIONS keeps N versions per group, not a commit-time window, so
    # its readability horizon is data-dependent: a group is complete only at
    # or after its oldest RETAINED version. The max of that over touched
    # groups is the sound time-travel cutoff recorded for _check_readable.
    fv_horizon = None
    for grp in table.view().groups.values():
        slices = sorted(grp.slices.values(), key=lambda s: s.base_instant,
                        reverse=True)
        if policy == CleaningPolicy.KEEP_LATEST_FILE_VERSIONS:
            obsolete = slices[retained:]
            if obsolete and retained >= 1:
                succ = slices[retained - 1].base_instant
                if fv_horizon is None or succ > fv_horizon:
                    fv_horizon = succ
        else:
            last_replaced = grp.replaced_before(None)
            if not grp.is_live(None) and last_replaced is not None \
                    and last_replaced <= earliest_retained:
                # replaced before the retention window: whole group obsolete
                obsolete = slices
            else:
                # keep all slices >= earliest_retained plus ONE older slice
                # (it serves snapshots as-of earliest_retained)
                older = [s for s in slices if s.base_instant < earliest_retained]
                obsolete = older[1:]
        for sl in obsolete:
            paths = []
            if sl.base_file is not None:
                paths.append(sl.base_file.path)
            paths += [lf.path for lf in sl.log_files]
            if any(p in pinned for p in paths):
                continue  # savepointed
            deleted_slices.append({"partition": sl.partition,
                                   "file_id": sl.file_id,
                                   "instant": sl.base_instant})
            deleted_logs += [lf.path for lf in sl.log_files]
            deleted_paths += paths
    # log files superseded by a logcompaction at/before the retention
    # horizon: no reader inside the window can need them (older time travel
    # is already forfeited by this policy, same as for deleted slices)
    if earliest_retained is not None:
        for grp in view.groups.values():
            # ALL retained slices, not just the latest: a logcompaction
            # followed by a full compaction leaves the compacted originals
            # in a superseded slice, which would otherwise leak storage
            # until the whole slice ages out
            for sl in grp.slices.values():
                for lf in sl.log_files:
                    if lf.compacted_at is not None \
                            and lf.compacted_at <= earliest_retained \
                            and lf.path not in pinned \
                            and lf.path not in deleted_logs:
                        deleted_logs.append(lf.path)
                        deleted_paths.append(lf.path)
    if not deleted_paths:
        return None
    fs = table.storage
    for p in deleted_paths:
        if os.path.isabs(p):
            continue  # metadata-only bootstrap source — never ours to delete
        ap = os.path.join(table.base_path, p)
        if fs.exists(ap):
            fs.remove(ap)
    t = timeline.new_instant_time()
    timeline.create_requested(tl.CLEAN, t)
    timeline.complete(tl.CLEAN, t, {
        "policy": policy, "retained": retained,
        "earliest_retained": earliest_retained or fv_horizon,
        "deleted_slices": deleted_slices,
        "deleted_log_files": deleted_logs,
        "num_files_deleted": len(deleted_paths)})
    return t
