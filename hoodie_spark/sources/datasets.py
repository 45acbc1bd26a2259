"""Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md).

``events.parquet`` carries TIMESTAMP(NANOS) which Spark's vectorized parquet
reader rejects by default; we read nanos as long (legacy conf) and convert to
a microsecond TimestampType column so downstream semantics (and the DuckDB
oracle, which truncates to µs on cast) line up."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # integer division: ns epoch exceeds double's exact range, so a
        # float divide can be off by 1µs vs DuckDB's exact truncation
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)
