from .merge import MergeIntoBuilder, delete_where, update
from .parser import parse_merge, run_sql

__all__ = ["MergeIntoBuilder", "update", "delete_where", "parse_merge",
           "run_sql"]
