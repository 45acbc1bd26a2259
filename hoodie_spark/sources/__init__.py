from .datasets import load_table, TABLES

__all__ = ["load_table", "TABLES"]
