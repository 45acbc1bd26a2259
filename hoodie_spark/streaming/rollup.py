"""Continuous windowed aggregates (hypertable-rollup style).

The reference has no native late-data handling — ordering is resolved by
the precombine field at upsert time (SURVEY.md §2.7, last row). This
extension composes the two halves Spark and the table format each do well:

* Structured Streaming computes the windowed aggregate with a WATERMARK —
  state is bounded, late rows inside the watermark update their window,
  rows beyond it are dropped;
* every update-mode micro-batch is UPSERTED into a hoodie table keyed by
  ``(window_start, *keys)`` — so the rollup table is transactional,
  time-travelable, incrementally readable, and late refinements simply
  rewrite their row.

At 100 TB the rollup table is tiny relative to the event stream (one row
per window x key), the streaming state is bounded by the watermark horizon,
and the upsert path is the same manifest-pruned write as any other table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sink import foreach_batch_writer


def windowed_rollup_frame(stream: DataFrame, ts_col: str, keys: list[str],
                          window: str, aggs: dict[str, object],
                          watermark: str = "30 minutes",
                          slide: str | None = None) -> DataFrame:
    """The streaming aggregate: ``window_start`` + keys + named aggregates.

    ``aggs`` maps output column name → Column aggregate (e.g.
    ``{"cnt": F.count(F.lit(1)), "sum_v": F.sum("value")}``)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (stream.withWatermark(ts_col, watermark)
            .groupBy(w.alias("__w"), *keys)
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .select(F.col("__w.start").alias("window_start"), *keys,
                    *aggs.keys()))


def create_rollup_table(spark, path: str, name: str, keys: list[str],
                        storage=None):
    """The target table: record key = (window_start, *keys); non-partitioned
    by default (a caller wanting retention partitions can pass its own
    table instead)."""
    from ..table import HoodieTable

    return HoodieTable.create(
        spark, path, name, recordkey_fields=["window_start", *keys],
        storage=storage)


def continuous_aggregate(stream: DataFrame, table, ts_col: str,
                         keys: list[str], window: str,
                         aggs: dict[str, object],
                         watermark: str = "30 minutes",
                         checkpoint: str | None = None,
                         trigger_available_now: bool = False,
                         slide: str | None = None):
    """Start the rollup stream: windowed agg (update mode) → upsert sink.

    Returns the StreamingQuery. The table's record key must be
    ``(window_start, *keys)`` (see :func:`create_rollup_table`);
    exactly-once across restarts comes from the sink's batch-id dedup."""
    rolled = windowed_rollup_frame(stream, ts_col, keys, window, aggs,
                                   watermark, slide)
    writer = (rolled.writeStream
              .outputMode("update")
              .foreachBatch(foreach_batch_writer(table)))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
