"""Table layout upgrade / downgrade.

Reference parity: hudi-client-common/.../table/upgrade/UpgradeDowngrade.java
(step-wise handler chain between layout versions, version persisted in
table properties) and hudi-spark-client/.../table/upgrade/
ZeroToOneUpgradeHandler.java (a concrete migration).

Our layout versions:

* **v1** — commit-manifest ``write_stats`` without per-file record-key
  ranges (early-round layout).
* **v2** — every base-file stat carries ``min_key`` / ``max_key``
  harvested from the parquet footer, enabling manifest range pruning for
  index tagging (:func:`hoodie_spark.index._prune_by_key_range`) and
  point-lookup reads (:meth:`ReadClient.read_keys`).

``upgrade`` backfills the ranges for live base files by reading their
footers (one footer read per file, no data IO — parallelize over an RDD of
paths at cluster scale); ``downgrade`` strips them. Both rewrite the
completed commit manifests atomically and bump/lower ``config.version``.
"""

from __future__ import annotations

import os

from .. import timeline as tl

CURRENT_VERSION = 2


def _rewrite_stats(table, mutate) -> int:
    """Apply ``mutate(stat_dict) -> bool`` to every write_stat of every
    completed data instant; atomically rewrite manifests that changed.
    Returns the number of stats touched."""
    touched = 0
    for inst in table.timeline.completed(tl.DATA_ACTIONS,
                                         include_archived=False):
        md = table.timeline.metadata(inst)
        changed = False
        for st in md.get("write_stats", []):
            if mutate(st):
                changed = True
                touched += 1
        if changed:
            table.timeline._atomic_write(table.timeline._path(inst), md)
    return touched


def upgrade(table, to_version: int = CURRENT_VERSION) -> int:
    """Run pending upgrade handlers; returns stats touched. Idempotent."""
    from ..writer import _footer_stats

    touched = 0
    while table.config.version < to_version:
        v = table.config.version
        if v == 1:
            def backfill(st):
                if st.get("is_delta") or st.get("bootstrap"):
                    return False
                if st.get("min_key") is not None:
                    return False
                p = st["path"] if os.path.isabs(st["path"]) \
                    else os.path.join(table.base_path, st["path"])
                if not table.storage.exists(p):
                    return False
                fs = _footer_stats(p)
                st["min_key"], st["max_key"] = fs["min_key"], fs["max_key"]
                st["num_records"] = fs["num_records"]
                return True

            touched += _rewrite_stats(table, backfill)
        else:
            raise ValueError(f"no upgrade handler from version {v}")
        table.config.version = v + 1
        table.save_properties()
    return touched


def downgrade(table, to_version: int = 1) -> int:
    """Inverse handlers, newest first. Returns stats touched."""
    touched = 0
    while table.config.version > to_version:
        v = table.config.version
        if v == 2:
            def strip(st):
                if st.get("min_key") is None and st.get("max_key") is None:
                    return False
                st["min_key"] = None
                st["max_key"] = None
                return True

            touched += _rewrite_stats(table, strip)
        else:
            raise ValueError(f"no downgrade handler from version {v}")
        table.config.version = v - 1
        table.save_properties()
    return touched
