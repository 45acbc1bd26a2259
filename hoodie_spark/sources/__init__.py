from .datasets import load_table, TABLES
from .spark_datasource import HoodieDataSource

__all__ = ["load_table", "TABLES", "HoodieDataSource"]
