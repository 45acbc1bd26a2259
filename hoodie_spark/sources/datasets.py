"""Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md).

``events.parquet``'s ``ts`` column has shipped in different physical shapes
across testdata regenerations: TIMESTAMP(NANOS) (read as int64 nanos via the
legacy conf), plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ), or already a
session-tz timestamp.  We branch on the dtype Spark actually reads so a
regeneration can't break the loader, and normalize to a microsecond
TimestampType column so downstream semantics (and the DuckDB oracle, which
truncates to µs on cast) line up."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce an event-timestamp column to session-tz TimestampType.

    Handles all physical shapes the testdata has shipped in:
    - ``bigint``: nanosecond epoch (legacy nanos-as-long read). Integer
      division: the ns epoch exceeds double's exact range, so a float divide
      can be off by 1µs vs DuckDB's exact truncation.
    - ``timestamp_ntz``: parquet TIMESTAMP(MICROS, isAdjustedToUTC=false);
      cast interprets the wall-clock value in the session timezone (UTC in
      all our entry points), matching DuckDB's naive-timestamp semantics.
    - ``timestamp``: already what we want.
    """
    t = dict(df.dtypes).get(col)
    if t == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if t is not None and t != "timestamp":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # harmless no-op unless the file is TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)
