"""hoodie_spark — a PySpark-native transactional table format + incremental
processing engine with the query and data-processing capabilities of Apache
Hudi (reference: /root/reference @ 0.9.0-SNAPSHOT), re-designed Spark-first:
DataFrame/Catalyst for every data movement, driver-side JSON timeline +
manifests for all metadata, Parquet everywhere."""

from .config import (BootstrapMode, IndexType, MergePolicy, TableConfig,
                     TableType, WriteConcurrencyMode, WriteConfig,
                     WriteOperation)
from .cdc import apply_cdc
from .export import export_snapshot
from .importer import import_parquet
from .keygen import custom_partition_expr
from .table import HoodieTable
from .writer import WriteConflictError

__all__ = [
    "HoodieTable", "TableConfig", "WriteConfig", "TableType", "MergePolicy",
    "IndexType", "WriteOperation", "BootstrapMode", "WriteConcurrencyMode",
    "WriteConflictError", "apply_cdc", "export_snapshot",
    "import_parquet",
    "custom_partition_expr",
]
