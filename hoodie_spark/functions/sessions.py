"""Event sessionization — gap-based sessions as pure window expressions.

The reference delegates windowing to the host engine (SURVEY.md §2.7: no
native late-data handling; ordering-field merge only). This operator covers
the batch/incremental side of that gap: assign a session id to every event
such that consecutive events of the same user more than ``gap`` apart start
a new session.

Plan shape: one shuffle by user, two window passes over it (lag + running
sum) — no Python, fully codegen'd. At 100 TB this is the canonical
sessionization plan; skewed users are bounded by per-user event counts, not
corpus size. For live streams the same semantics come from Structured
Streaming's ``session_window`` aggregation; this function is the
batch-equivalent used for backfills and incremental recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_seconds: int = 1800,
               out_col: str = "session_id") -> DataFrame:
    """Add ``session_id`` (string ``<user>#<n>``, n starting at 0) and
    ``session_start`` (timestamp of the session's first event).

    Ties on the timestamp within a user do not start new sessions.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    gap_us = gap_seconds * 1_000_000
    new_session = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(F.col(ts_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.withColumn("__new", new_session)
    sess_n = F.sum("__new").over(running) - F.lit(1)
    # session_start = the latest session-OPENING timestamp at or before
    # this row — computable inside the same streaming running-frame pass,
    # so there is no third window keyed on the session id (which would
    # add a whole extra Exchange and buffer a pathological bot session's
    # rows in one task)
    sess_start = F.max(F.when(F.col("__new") == 1,
                              F.col(ts_col))).over(running)
    return (staged
            .withColumn(out_col, F.concat(F.col(user_col).cast("string"),
                                          F.lit("#"),
                                          sess_n.cast("string")))
            .withColumn("session_start", sess_start)
            .drop("__new"))
