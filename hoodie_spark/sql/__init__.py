from .merge import MergeIntoBuilder, delete_where, update

__all__ = ["MergeIntoBuilder", "update", "delete_where"]
