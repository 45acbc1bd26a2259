"""Point-in-time (as-of) join.

The reference delegates all relational joins to the host engine and Spark
has no native AS OF join — this is one of the custom operators the engine
supplies (like the streaming rollup). Semantics match the classic
feature-store / market-data join: for every left row, the single right row
with the same key and the greatest ``right_ts <= left_ts`` (``backward``;
``forward`` = smallest ``right_ts >= left_ts``), optionally bounded by a
``tolerance`` in seconds.

Spark-first plan — ONE shuffle, no range-explosion: tag both inputs, union
by key, and run a single ``last(value, ignorenulls=True)`` window ordered
by (ts, side) — every left row picks up the latest right payload that
sorted before it. This is the merge-join formulation of as-of: wall-clock
and shuffle volume are O(|L| + |R|), versus the O(|L| x |R| per key) blowup
of the naive ``l.ts >= r.ts`` range join Catalyst would otherwise plan.
Right rows tied on (key, ts) resolve deterministically to the one with the
greatest tiebreak column (or arbitrary-but-stable input order if none).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str | None = None,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              right_tiebreak: str | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Columns: all of ``left`` + each picked right column as
    ``<name><suffix>`` + ``<right_ts><suffix>`` (null when no match /
    outside tolerance). ``on`` must exist in both frames.
    ``right_tiebreak`` picks the winner among right rows sharing
    (key, ts): greatest value wins for backward, smallest for forward."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_ts = right_ts or left_ts
    rcols = right_cols or [c for c in right.columns
                           if c not in on and c != right_ts]

    rv = F.struct(F.col(right_ts).alias("__rts"),
                  *[F.col(c) for c in rcols])
    tie_r = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r2 = right.select(*on, F.col(right_ts).alias("__ts"),
                      rv.alias("__rv"), F.lit(0).alias("__side"),
                      tie_r.alias("__tie"))
    l2 = left.select(*left.columns, F.col(left_ts).alias("__ts"),
                     F.lit(None).cast(r2.schema["__rv"].dataType).alias("__rv"),
                     F.lit(1).alias("__side"),
                     F.lit(None).cast(r2.schema["__tie"].dataType).alias("__tie"))

    # backward: right rows at ts t must sort BEFORE left rows at the same t
    # (<= semantics) and the last right row among (ts, tie)-equals wins;
    # forward mirrors with a descending scan.
    if direction == "backward":
        w = Window.partitionBy(*on) \
            .orderBy(F.asc("__ts"), F.asc("__side"), F.asc_nulls_last("__tie")) \
            .rowsBetween(Window.unboundedPreceding, 0)
    else:
        w = Window.partitionBy(*on) \
            .orderBy(F.desc("__ts"), F.asc("__side"), F.desc_nulls_last("__tie")) \
            .rowsBetween(Window.unboundedPreceding, 0)

    unioned = l2.unionByName(r2, allowMissingColumns=True)
    matched = unioned.withColumn(
        "__m", F.last("__rv", ignorenulls=True).over(w)) \
        .filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros(F.col(left_ts)) -
                    F.unix_micros(F.col("__m.__rts"))) / 1e6
        matched = matched.withColumn(
            "__m", F.when(gap <= tolerance_seconds, F.col("__m")))

    out = matched.select(
        *left.columns,
        F.col("__m.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in rcols])
    return out
