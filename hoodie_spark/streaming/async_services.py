"""Async table services: compaction/cleaning overlapped with ingestion.

Reference parity: AsyncCompactService / AsyncClusteringService
(HoodieStreamingSink.scala:65-97, HoodieDeltaStreamer.java:354-359) — table
services run on their own thread so the ingest loop isn't blocked.

Spark-first concurrency model: Spark happily runs jobs submitted from
several driver threads, but this engine is single-writer by default, so the
service thread and the ingest thread serialize TABLE MUTATIONS on a shared
lock. What genuinely overlaps is everything else — source fetch, transform,
dedup and index tagging of the next batch proceed while a compaction or
clean commits. Writers opt in by wrapping their write calls with
``services.write_lock`` (the provided sink/ingestor integration does this).
"""

from __future__ import annotations

import threading

from ..config import TableType

__all__ = ["AsyncTableServices"]


class AsyncTableServices:
    """Background compaction / cleaning for one table.

    Usage::

        services = AsyncTableServices(table, compact_every=2, clean_every=5)
        writer_fn = foreach_batch_writer(table, services=services)
        ...
        services.stop()
    """

    def __init__(self, table, compact_every: int | None = None,
                 clean_every: int | None = None,
                 cluster_every: int | None = None,
                 cluster_plan_strategy: str | None = None,
                 logcompact_every: int | None = None):
        self.table = table
        self.compact_every = compact_every
        self.clean_every = clean_every
        self.cluster_every = cluster_every
        self.logcompact_every = logcompact_every
        # streaming ingest clusters with the recency plan by default: only
        # the newest partitions accumulate small files, and planning over
        # the full history every N commits defeats the point at scale
        # (AsyncClusteringService + SparkRecentDaysClusteringPlanStrategy)
        self.cluster_plan_strategy = cluster_plan_strategy or "recent_days"
        self.write_lock = threading.Lock()
        self._wake = threading.Event()
        self._stopped = threading.Event()
        self._errors: list[BaseException] = []
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=f"hoodie-services-{table.config.name}")
        self._thread.start()

    # ------------------------------------------------------------- ingest API
    def after_commit(self) -> None:
        """Signal the service thread that a new commit landed."""
        self._wake.set()

    def stop(self, wait: bool = True) -> None:
        self._stopped.set()
        self._wake.set()
        if wait:
            self._thread.join(timeout=300)
        if self._errors:
            raise self._errors[0]

    # ---------------------------------------------------------------- worker
    def _run(self) -> None:
        while not self._stopped.is_set():
            self._wake.wait()
            self._wake.clear()
            if self._stopped.is_set():
                break
            try:
                self._maybe_run_services()
            except BaseException as e:  # surface on stop()
                self._errors.append(e)
                return
        # drain once on shutdown so trailing commits still get services
        try:
            self._maybe_run_services()
        except BaseException as e:
            self._errors.append(e)

    def _maybe_run_services(self) -> None:
        tl_ = self.table.timeline
        if self.compact_every and \
                self.table.config.table_type == TableType.MERGE_ON_READ:
            n_delta = len(tl_.completed(("deltacommit",)))
            if n_delta and n_delta % self.compact_every == 0:
                with self.write_lock:
                    self.table.compact()
        if self.logcompact_every and \
                self.table.config.table_type == TableType.MERGE_ON_READ:
            n_delta = len(tl_.completed(("deltacommit",)))
            if n_delta and n_delta % self.logcompact_every == 0:
                with self.write_lock:
                    self.table.logcompact()
        if self.cluster_every:
            n_data = len(tl_.completed(("commit", "deltacommit")))
            if n_data and n_data % self.cluster_every == 0:
                with self.write_lock:
                    self.table.cluster(
                        plan_strategy=self.cluster_plan_strategy)
        if self.clean_every:
            n_commits = len(tl_.completed())
            if n_commits and n_commits % self.clean_every == 0:
                with self.write_lock:
                    self.table.clean()
