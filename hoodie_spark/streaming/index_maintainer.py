"""ANN index as a maintained table service: keep a persisted IVF or
IVF-PQ index (functions/similarity.write_ivf_index /
write_ivfpq_index layouts) in step with a hoodie_spark table as the
table ingests — the serving-side sibling of
:class:`~hoodie_spark.streaming.incremental_dedup.IncrementalDeduper`.

Reference parity: the reference keeps query-side structures current via
table services on the timeline (compaction/clustering planned off
completed instants); this applies the same watermark + catch-up
contract to the vector-index sidecar a retrieval pipeline serves from.

Consistency contract
--------------------
* The watermark (last indexed table instant) lives in
  ``_watermark.json`` INSIDE the index directory — the underscore
  prefix makes it invisible to the parquet reader — and is published
  with the same atomic single-PUT the table state uses.
* ``catch_up()`` reads the table's OWN incremental view since the
  watermark and folds the delta in as DELETE-then-APPEND: updated
  vectors move lists instead of shadowing their stale version, and a
  crash between the fold and the watermark publish simply replays the
  same delta — the delete pass removes the half-applied copy first, so
  replays CONVERGE (content idempotence, not just at-least-once).
* A rollback/restore newer than the watermark invalidates indexed rows
  the incremental view can no longer explain; the maintainer rebuilds
  the index from the table's current snapshot (O(table), rollback is a
  rare operator action — same degradation contract as the deduper).
* Work per sync is delta-sized: one broadcast semi-join bounded by the
  delta's ids (the delete), one assignment map pass + append write.
  Small files fold via ``compact_every`` using the layout-agnostic
  :func:`~hoodie_spark.functions.similarity.compact_ivf_index`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..functions.similarity import (append_ivf_index, append_ivfpq_index,
                                    compact_ivf_index,
                                    delete_from_ivf_index, write_ivf_index,
                                    write_ivfpq_index)
from .maintainer import locked_fold

__all__ = ["IvfIndexMaintainer"]


class IvfIndexMaintainer:
    """Keeps a persisted IVF (or IVF-PQ when ``books`` is given) index in
    step with ``table``. Single-writer, like every table service: run it
    from the ingest pipeline (``Ingestor(index_maintainers=[...])``) or
    the async-services seat, never from two drivers at once."""

    def __init__(self, table, index_path: str, centroids: DataFrame,
                 id_col: str, vec_col: str, books=None,
                 compact_every: int = 0, track_deletes: bool = False):
        self.table = table
        self.path = index_path
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.books = books
        self.compact_every = int(compact_every or 0)
        # plain incremental reads carry no tombstones, so a table DELETE
        # leaves its vector in the index until the next rebuild — fine
        # for append/upsert ingest pipelines. For delete-heavy tables set
        # track_deletes=True: catch_up then reads the CDC-format view
        # (op i/u/d with before/after images) and removes deleted ids in
        # the same delta-sized pass. CDC inherits its retention
        # constraint: the cleaner must still hold the pre-image slices
        # (loud failure otherwise, same as time travel).
        self.track_deletes = bool(track_deletes)
        self.fs = table.storage  # Storage seam: object-store swappable
        self._lock_dir = index_path  # single-maintainer fence (maintainer.py)
        self._syncs = 0

    # ------------------------------------------------------------ watermark
    @property
    def _wm_path(self) -> str:
        return os.path.join(self.path, "_watermark.json")

    def _load_mark(self) -> str | None:
        raw = self.fs.read_bytes(self._wm_path)
        return None if raw is None else json.loads(raw).get("instant")

    def _publish_mark(self, instant: str | None) -> None:
        from .. import storage

        self.fs.makedirs(self.path)
        storage.ATOMIC.put_atomic(
            self._wm_path, json.dumps({"instant": instant}).encode())

    # --------------------------------------------------------------- folds
    def _append(self, delta: DataFrame) -> None:
        if self.books is None:
            append_ivf_index(delta, self.centroids, self.id_col,
                             self.vec_col, self.path)
        else:
            append_ivfpq_index(delta, self.centroids, self.books,
                               self.id_col, self.vec_col, self.path)

    def _rebuild(self) -> int:
        import logging

        logging.getLogger(__name__).warning(
            "ANN index at %s invalidated by rollback/restore — rebuilding "
            "from the current table snapshot", self.path)
        current = self.table.snapshot().select(self.id_col, self.vec_col)
        if self.books is None:
            write_ivf_index(current, self.centroids, self.id_col,
                            self.vec_col, self.path)
        else:
            write_ivfpq_index(current, self.centroids, self.books,
                              self.id_col, self.vec_col, self.path)
        last = self.table.timeline.last_completed()
        self._publish_mark(last.timestamp if last else None)
        return current.count()

    # ------------------------------------------------------------- catch-up
    @locked_fold
    def catch_up(self) -> int:
        """Fold every table change since the watermark into the index.
        Returns the number of delta rows applied (or snapshot rows on a
        rebuild). Safe to call any time — a no-op when current."""
        mark = self._load_mark()
        if mark is not None:
            from .. import timeline as tl

            undone = [i for i in self.table.timeline.completed(
                          (tl.ROLLBACK, tl.RESTORE))
                      if i.timestamp > mark]
            if undone:
                return self._rebuild()
        last = self.table.timeline.last_completed()
        if last is None or (mark is not None and last.timestamp <= mark):
            if mark is None:
                self._publish_mark(None)
            return 0
        if not any(e.startswith("centroid=")
                   for e in self.fs.listdir(self.path)):
            # no inverted lists yet — first sync of a pre-existing table,
            # or the table was empty when the watermark was first
            # published (the dir holds only _watermark.json, which the
            # delta fold's index read could not even schema-infer):
            # build everything once from the snapshot
            return self._rebuild()
        spark = self.table.spark
        if self.track_deletes:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            ev = self.table.incremental_cdc(begin=mark, end=last.timestamp)
            # a key touched by several in-range commits appears once per
            # commit — only its LATEST event decides index membership
            latest = Window.partitionBy("_hoodie_record_key").orderBy(
                F.col("ts").desc())
            ev = (ev.withColumn("__rn", F.row_number().over(latest))
                  .filter(F.col("__rn") == 1))
            gone = ev.filter(F.col("op") == "d").select(
                F.col(f"before.{self.id_col}").alias(self.id_col))
            upserts = (ev.filter(F.col("op") != "d")
                       .select(F.col(f"after.{self.id_col}")
                               .alias(self.id_col),
                               F.col(f"after.{self.vec_col}")
                               .alias(self.vec_col)))
            touched = upserts.select(self.id_col).unionByName(gone)
            n = touched.count()
            if n:
                delete_from_ivf_index(spark, self.path, touched,
                                      self.id_col)
                self._append(upserts)
        else:
            delta = (self.table.incremental(begin=mark,
                                            end=last.timestamp)
                     .select(self.id_col, self.vec_col))
            n = delta.count()
            if n:
                # DELETE-then-APPEND: moves updated vectors to their new
                # list and makes crash replays of this delta converge
                delete_from_ivf_index(spark, self.path,
                                      delta.select(self.id_col),
                                      self.id_col)
                self._append(delta)
        if n:
            self._syncs += 1
            if self.compact_every and self._syncs % self.compact_every == 0:
                compact_ivf_index(spark, self.path)
        self._publish_mark(last.timestamp)
        return n

    # --------------------------------------------------------- ingest hook
    def on_commit(self, batch: DataFrame | None = None,
                  result=None) -> int:
        """Ingestor post-commit hook; folds the just-committed delta (and
        anything a previous crash left behind) into the index."""
        return self.catch_up()
