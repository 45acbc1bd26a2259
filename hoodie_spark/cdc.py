"""CDC ingestion helpers.

Reference parity: AWSDmsAvroPayload (hudi-spark-datasource/hudi-spark/src/
main/java/org/apache/hudi/payload/AWSDmsAvroPayload.java — a record whose
``Op`` column is ``D`` deletes instead of updating) and AWSDmsTransformer
(hudi-utilities/.../transform/AWSDmsTransformer.java — fills a missing Op
column for full-load files).

Spark-first: the op column maps onto the engine's soft-delete channel
(``_hoodie_is_deleted``), so a CDC batch is a single upsert — inserts,
updates, and deletes resolved in one Catalyst job."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import IS_DELETED

__all__ = ["apply_cdc"]

DELETE_OPS = ("D", "d", "delete")


def apply_cdc(df: DataFrame, op_col: str = "Op",
              delete_values: tuple[str, ...] = DELETE_OPS) -> DataFrame:
    """Turn a CDC batch (insert/update/delete rows marked by ``op_col``)
    into an upsert-able DataFrame: delete ops set the soft-delete flag.

    A missing op column is treated as all-inserts (AWSDmsTransformer
    semantics for full-load files)."""
    if op_col not in df.columns:
        return df
    return df.withColumn(
        IS_DELETED, F.coalesce(F.col(op_col).isin(*delete_values), F.lit(False))
    ).drop(op_col)
