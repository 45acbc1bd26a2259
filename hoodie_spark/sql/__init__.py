from .merge import MergeIntoBuilder, delete_where, update
from .parser import parse_merge, run_sql
from .session import disable, enable, register_table

__all__ = ["MergeIntoBuilder", "update", "delete_where", "parse_merge",
           "run_sql", "enable", "disable", "register_table"]
