"""Structured Streaming sink.

Reference parity: HoodieStreamingSink.scala:41-97 — addBatch delegates to
the batch writer, skips already-committed batch ids after restart (the
commit metadata carries the checkpoint batch id), and triggers inline/async
table services between batches.

Spark-first: ``writeStream.foreachBatch`` is the idiomatic Spark expression
of the same contract; exactly-once across restarts comes from recording
``streaming_batch_id`` in commit metadata and skipping replays."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import TableType, WriteOperation


def _last_batch_id(table) -> int:
    for inst in reversed(table.timeline.completed()):
        md = table.timeline.metadata(inst)
        bid = md.get("extra", {}).get("streaming_batch_id")
        if bid is not None:
            return int(bid)
    return -1


def foreach_batch_writer(table, operation: str = WriteOperation.UPSERT,
                         compact_every: int | None = None, services=None,
                         maintainers=None):
    """Returns fn(batch_df, batch_id) for ``writeStream.foreachBatch``.

    ``services`` (an :class:`~hoodie_spark.streaming.AsyncTableServices`)
    moves compaction/cleaning to a background thread — the batch write
    serializes with them on the services' write lock, everything else
    overlaps. Without it, ``compact_every`` triggers inline compaction
    (HoodieStreamingSink's sync mode). ``maintainers`` (anything with
    ``on_commit`` — IvfIndexMaintainer, CorpusSketchMaintainer,
    DriftMonitor) catch up after each committed batch, the same
    post-commit seat the Ingestor gives them; replayed batches are
    skipped BEFORE the maintainers run, so their watermarks never see a
    duplicate."""

    def fn(batch_df: DataFrame, batch_id: int):
        if batch_id <= _last_batch_id(table):
            return  # replayed batch after restart — already committed
        import contextlib
        lock = services.write_lock if services is not None \
            else contextlib.nullcontext()
        with lock:
            table._writer.commit_extra["streaming_batch_id"] = int(batch_id)
            if operation == WriteOperation.INSERT:
                table.insert(batch_df)
            else:
                table.upsert(batch_df)
            if services is None and compact_every and \
                    table.config.table_type == TableType.MERGE_ON_READ:
                n_delta = len(table.timeline.completed(("deltacommit",)))
                if n_delta and n_delta % compact_every == 0:
                    table.compact()
        if services is not None:
            services.after_commit()
        for m in (maintainers or []):
            m.on_commit(batch_df)

    return fn


def write_stream(stream_df: DataFrame, table, checkpoint_dir: str,
                 operation: str = WriteOperation.UPSERT,
                 compact_every: int | None = None, **trigger_kw):
    """``df.writeStream`` wired to the table; returns the StreamingQuery."""
    return (stream_df.writeStream
            .foreachBatch(foreach_batch_writer(table, operation, compact_every))
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kw or {"availableNow": True}))
            .start())
