"""Streaming source: micro-batches as incremental queries between offsets.

Reference parity: HoodieStreamSource.scala:49-169 — each micro-batch is an
incremental query between two commit-timestamp offsets
(HoodieSourceOffset.scala); initial offset earliest or latest.

Spark-first: offsets ARE instant timestamps; a poll loop (or foreachBatch
of a driving stream) asks ``incremental_batches`` for whatever committed
after the last offset. Replaying all batches equals the snapshot — the
streaming-parity invariant the tests assert.

For a REAL ``spark.readStream.format("hoodie_spark")`` subscription (with
engine-managed checkpoints and executor-side reads) use
:class:`hoodie_spark.sources.HoodieDataSource` — this generator remains as
the lightweight in-process path for drivers like streaming/ingest.py."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from .. import timeline as tl


def latest_offset(table) -> str | None:
    last = table.timeline.last_completed()
    return last.timestamp if last else None


def incremental_batches(table, from_offset: str | None = None,
                        max_batches: int | None = None
                        ) -> Iterator[tuple[str, DataFrame]]:
    """Yield (new_offset, batch_df) per committed instant after
    ``from_offset`` (None = earliest). Batches align to commit boundaries,
    like the reference's one-offset-range-per-micro-batch."""
    offset = from_offset or ""
    n = 0
    for inst in table.timeline.completed(tl.DATA_ACTIONS):
        if inst.timestamp <= offset:
            continue
        yield inst.timestamp, table.incremental(begin=offset, end=inst.timestamp)
        offset = inst.timestamp
        n += 1
        if max_batches is not None and n >= max_batches:
            return
