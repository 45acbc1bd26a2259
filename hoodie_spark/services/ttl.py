"""Partition TTL: expire partitions past a retention horizon.

Public Hudi design (partition-lifecycle RFC; this reference snapshot
predates it): a table service that turns retention policy into
``delete_partition`` replacecommits, so expiry is a metadata operation —
no row-level deletes, no file rewrites; the cleaner reclaims the bytes
later under the normal retention rules.

Scale shape: the candidate set comes from the driver-side manifest fold
(``view.partitions()``), never a storage listing, and the expiry itself
writes only a replacecommit — O(expired partitions) metadata however large
the table.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["expired_partitions", "apply_ttl"]


def expired_partitions(table, *, keep_latest: int | None = None,
                       older_than: str | None = None,
                       predicate: Callable[[str], bool] | None = None
                       ) -> list[str]:
    """Partitions due for expiry under exactly one policy:

    - ``keep_latest=N`` — everything but the N lexicographically-largest
      partition paths (date-style paths sort chronologically, mirroring the
      recent-days clustering planner's lookback);
    - ``older_than=P`` — partitions strictly below ``P`` (e.g. ``"2024"``);
    - ``predicate=fn`` — explicit policy callable.
    """
    chosen = [p for p in (keep_latest, older_than, predicate)
              if p is not None]
    if len(chosen) != 1:
        raise ValueError("exactly one of keep_latest / older_than / "
                         "predicate is required")
    parts = sorted(table.view().partitions())
    if keep_latest is not None:
        if keep_latest < 1:
            raise ValueError("keep_latest must be >= 1")
        return parts[:-keep_latest] if len(parts) > keep_latest else []
    if older_than is not None:
        return [p for p in parts if p < older_than]
    return [p for p in parts if predicate(p)]


def apply_ttl(table, *, keep_latest: int | None = None,
              older_than: str | None = None,
              predicate: Callable[[str], bool] | None = None):
    """Expire due partitions via one ``delete_partition`` replacecommit.
    Returns the WriteResult, or None when nothing is due."""
    due = expired_partitions(table, keep_latest=keep_latest,
                             older_than=older_than, predicate=predicate)
    if not due:
        return None
    return table.delete_partitions(due)
