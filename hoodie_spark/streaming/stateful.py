"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming (SURVEY.md §2.7 — ordering-field
merge only); these cover the gap for training-data pipelines where the
stream itself must be deduplicated or sessionized before it ever reaches a
table.

State lives in Spark's state store (checkpointed, partitioned by key), so
the operators scale with the key space across executors and survive
restarts — the 100 TB path is the same code with a real checkpoint dir on
durable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stateful_dedup", "stateful_session_counts"]


def stateful_dedup(stream_df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact first-seen-wins dedup across the WHOLE stream history.

    Arrow-batched per-key state: one tiny marker per distinct key. Rows for
    keys already seen in any earlier batch (or earlier in this batch) are
    dropped; the first occurrence passes through unchanged.
    """
    schema = stream_df.schema

    def fn(key, pdf_iter, state: GroupState):
        emitted = state.exists
        for pdf in pdf_iter:
            if emitted or len(pdf) == 0:
                continue
            yield pdf.head(1)
            emitted = True
        if emitted and not state.exists:
            state.update((1,))

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, "seen int", "append", GroupStateTimeout.NoTimeout)


def stateful_session_counts(stream_df: DataFrame, user_col: str,
                            ts_col: str, gap_seconds: int = 1800) -> DataFrame:
    """Per-user running session counter: appends one (user, session_n,
    n_events) row per key per batch, carrying (last_ts_us, session_n,
    n_events) state across batches — the latest row per user is the live
    counter.

    The streaming analogue of :func:`hoodie_spark.functions.sessionize` —
    gap-based, microsecond precision, state per user."""
    import pandas as pd

    out_schema = f"{user_col} long, session_n int, n_events long"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            last_us, sess_n, n_events = state.get
        else:
            last_us, sess_n, n_events = None, -1, 0
        gap_us = gap_seconds * 1_000_000
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ts = pdf[ts_col].sort_values()
            for t in ts:
                t_us = int(pd.Timestamp(t).value // 1000)
                if last_us is None or t_us - last_us > gap_us:
                    sess_n += 1
                    n_events = 0
                last_us = t_us
                n_events += 1
        state.update((last_us if last_us is not None else 0, sess_n, n_events))
        yield pd.DataFrame({user_col: [key[0]], "session_n": [sess_n],
                            "n_events": [n_events]})

    return stream_df.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, "last_us long, session_n int, n_events long",
        "append", GroupStateTimeout.NoTimeout)
