"""Interval (range) join.

Like :mod:`.asof`, a custom operator the host engine lacks a scalable plan
for: joining points to containing intervals with a plain
``r.start <= l.point AND l.point <= r.end`` predicate gives Catalyst only a
per-key nested loop (or a full cartesian without keys). The standard
scale-out shape is BUCKETIZATION: chop every interval into fixed-width
buckets, join point-bucket to interval-bucket as an equi-join (hash
shuffle, AQE-friendly), then apply the exact predicate. A (point,
interval) pair can only meet in the point's single bucket, so no dedup
pass is needed. Shuffle volume is O(|L| + |R| x avg_interval/width) — pick
``bucket_width`` near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               left_point: str, right_start: str, right_end: str,
               bucket_width: float, how: str = "inner",
               suffix: str = "_r") -> DataFrame:
    """All (left, right) pairs with equal ``on`` keys and
    ``right_start <= left_point <= right_end``.

    Point/bound columns may be numeric or timestamp (a timestamp casts to
    fractional epoch seconds, so ``bucket_width`` is then in seconds).
    Right columns clashing with left names are suffixed; ``how`` is
    ``inner`` or ``left`` (unmatched left rows kept with null right
    columns)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")

    rename = {c: f"{c}{suffix}" for c in right.columns
              if c in left.columns and c not in on}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rs = rename.get(right_start, right_start)
    re_ = rename.get(right_end, right_end)

    # cast to double: numerics pass through, timestamps become epoch seconds
    l2 = left.withColumn("__p", F.col(left_point).cast("double")) \
             .withColumn("__b", F.floor(F.col("__p") / bucket_width))
    r2 = (r.withColumn("__s", F.col(rs).cast("double"))
           .withColumn("__e", F.col(re_).cast("double"))
           .withColumn("__b", F.explode(F.sequence(
               F.floor(F.col("__s") / bucket_width),
               F.floor(F.col("__e") / bucket_width)))))

    cond = [l2["__b"] == r2["__b"]] + [l2[k] == r2[k] for k in on] + \
        [r2["__s"] <= l2["__p"], l2["__p"] <= r2["__e"]]
    joined = l2.join(r2, cond, how)
    out = joined.select(
        *[l2[c] for c in left.columns],
        *[r2[c].alias(c) for c in r.columns if c not in on])
    return out
