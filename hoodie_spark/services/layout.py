"""Space-filling-curve layout keys for multi-dimensional clustering.

Public Hudi layout-optimization design (RFC-28 lineage; this reference
snapshot predates it): a linear sort on ``(a, b)`` gives perfect file-level
min/max pruning on ``a`` and nearly none on ``b``. Sorting by a space-filling
curve of both columns keeps each output file small in EVERY dimension, so
column-stats pruning works for predicates on any subset of the layout
columns — the property that matters at 100 TB, where a scan planner that
prunes 95% of files on either predicate beats one that prunes on only the
leading column.

Spark-first shapes:

* :func:`zorder_key` — bit interleave as a pure Column expression
  (shift/and/or chains): linear expression size, whole-stage codegen, no
  Python. ``k`` columns × ``bits`` bits, ``k * bits <= 63``.
* :func:`hilbert_key` — the iterative rotate-and-flip recurrence references
  each intermediate twice per round, so inlining it as a Column expression
  grows the tree exponentially; it runs as a vectorized Arrow-batched
  pandas UDF over numpy int arrays instead (2 columns).
* Column domains come from one driver-side min/max aggregate (bounded: one
  row), NOT sampled partitioning — the mapping is a pure function of the
  data. String columns are ordered by the first 8 bytes (big-endian byte
  ordinal), which preserves lexicographic order for ASCII data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "hilbert_key", "with_curve_key"]


def _ordinal(col: Column, dtype: str) -> Column:
    """Order-preserving numeric image of a column (double). Strings map to
    the big-endian ordinal of their first 8 ASCII bytes."""
    if dtype == "string":
        padded = F.rpad(F.coalesce(col, F.lit("")), 8, "\x00")
        out = F.lit(0.0)
        for i in range(8):
            out = out * 256.0 + F.ascii(F.substring(padded, i + 1, 1))
        return out
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column from [lo, hi] onto integers [0, 2^bits)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    return F.least(
        F.lit(top),
        F.greatest(F.lit(0), F.floor(
            (col - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << bits)))
        )).cast("long")


def zorder_key(scaled: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each pre-scaled long column:
    output bit ``i*k + j`` = bit ``i`` of column ``j``. Pure shift/mask
    arithmetic — linear expression size, fully codegen'd."""
    k = len(scaled)
    if k * bits > 63:
        raise ValueError("k * bits must be <= 63")
    out = F.lit(0).cast("long")
    for j, c in enumerate(scaled):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + j))
    return out


def _hilbert_pandas(bits: int):
    import numpy as np
    import pandas as pd

    def xy2d(batch_x, batch_y):
        x = batch_x.to_numpy(dtype=np.int64, na_value=0).copy()
        y = batch_y.to_numpy(dtype=np.int64, na_value=0).copy()
        d = np.zeros_like(x)
        s = np.int64(1) << (bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant: where ry==0 → (flip if rx==1) then swap x/y
            flip = (ry == 0) & (rx == 1)
            x_f = np.where(flip, s - 1 - x, x)
            y_f = np.where(flip, s - 1 - y, y)
            rot = ry == 0
            x, y = np.where(rot, y_f, x_f), np.where(rot, x_f, y_f)
            s >>= 1
        return pd.Series(d)

    return xy2d


def hilbert_key(sx: Column, sy: Column, bits: int = 16) -> Column:
    """2-D Hilbert index of two pre-scaled long columns (Arrow-batched
    vectorized numpy; see module docstring for why not a Column expr)."""
    from pyspark.sql.pandas.functions import pandas_udf

    fn = pandas_udf(_hilbert_pandas(bits), "long")
    return fn(sx, sy)


def with_curve_key(df: DataFrame, cols: list[str], layout: str,
                   bits: int = 16, key_col: str = "__curve") -> DataFrame:
    """Attach a space-filling-curve key over ``cols``. One driver-side
    min/max aggregate fixes the per-column domains; the key itself is a
    deterministic function of the row."""
    dtypes = dict(df.dtypes)
    ords = [_ordinal(F.col(c), dtypes[c]) for c in cols]
    row = df.agg(*[f(o).alias(f"{tag}{i}")
                   for i, o in enumerate(ords)
                   for tag, f in (("lo", F.min), ("hi", F.max))]).first()
    scaled = []
    for i, o in enumerate(ords):
        lo, hi = row[f"lo{i}"], row[f"hi{i}"]
        if lo is None:
            scaled.append(F.lit(0).cast("long"))
        else:
            scaled.append(_scaled(o, float(lo), float(hi), bits))
    if layout == "zorder":
        key = zorder_key(scaled, bits)
    elif layout == "hilbert":
        if len(cols) != 2:
            raise ValueError("hilbert layout needs exactly 2 columns")
        key = hilbert_key(scaled[0], scaled[1], bits)
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return df.withColumn(key_col, key)
