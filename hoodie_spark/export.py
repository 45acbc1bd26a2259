"""Snapshot export / copy utilities.

Reference parity: hudi-utilities/.../HoodieSnapshotExporter.java:74-220
(export latest snapshot as json|parquet|orc|hudi, optional repartitioning,
``_SUCCESS`` tag, refuses an existing target) and HoodieSnapshotCopier.java
(hudi-format copy = latest file slices + timeline metadata).

Spark-first: the non-hudi path is one DataFrame write of the (optionally
as-of) snapshot with meta columns dropped — pushdown/pruning and output
sizing are Catalyst's problem; the hudi path copies the pruned file list
the manifest fold already computed, never a directory walk of the source.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from .config import META_COLUMNS

FORMATS = ("json", "parquet", "orc", "hudi")


def export_snapshot(table, target_path: str, output_format: str = "parquet",
                    as_of: str | None = None,
                    partition_field: str | None = None,
                    partitioner=None) -> str:
    """Export the table's latest (or as-of) snapshot.

    ``partitioner`` (HoodieSnapshotExporter.Partitioner equivalent) is a
    callable ``DataFrame -> DataFrameWriter`` for custom layouts; else
    ``partition_field`` drives ``write.partitionBy``. Returns the latest
    exported commit timestamp."""
    if output_format not in FORMATS:
        raise ValueError(f"invalid output format {output_format!r}; "
                         f"supported: {FORMATS}")
    if os.path.exists(target_path):
        raise FileExistsError("The target output path already exists.")
    completed = table.timeline.completed()
    latest = None
    for inst in completed:
        if as_of is None or inst.timestamp <= as_of:
            latest = inst.timestamp
    if latest is None:
        raise ValueError("No commits present. Nothing to snapshot.")

    if output_format == "hudi":
        _export_as_hudi(table, target_path, latest)
    else:
        df: DataFrame = table.snapshot(as_of=latest).drop(*META_COLUMNS)
        if partitioner is not None:
            writer = partitioner(df)
        elif partition_field:
            writer = df.repartition(partition_field) \
                       .write.partitionBy(partition_field)
        else:
            writer = df.write
        writer.format(output_format).save(target_path)
    with open(os.path.join(target_path, "_SUCCESS"), "a"):
        pass
    return latest


def _export_as_hudi(table, target_path: str, latest: str) -> None:
    """HoodieSnapshotCopier: copy the latest file slices as-of ``latest``
    plus the timeline metadata, yielding a loadable table."""
    view = table.view()
    os.makedirs(os.path.join(target_path, ".hoodie"), exist_ok=True)
    for sl in view.latest_slices(as_of=latest):
        files = ([sl.base_file.path] if sl.base_file else []) + \
            [lf.path for lf in sl.log_files_as_of(latest)]
        for rel in files:
            if os.path.isabs(rel):   # metadata-only bootstrap source
                continue
            dst = os.path.join(target_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(view.abs(rel), dst)
    # timeline (completed instants up to the snapshot point) + properties.
    # Archived instants have no active-timeline file to copy — their history
    # travels via the archive jsonl below (filtered to the snapshot point),
    # which the target's snapshot fold needs to reconstruct old slices.
    tl = table.timeline
    dst_tl = os.path.join(target_path, ".hoodie", "timeline")
    os.makedirs(dst_tl, exist_ok=True)
    for inst in tl.completed(include_archived=False):
        if inst.timestamp <= latest:
            shutil.copy2(tl._path(inst),
                         os.path.join(dst_tl, inst.filename()))
    # archived history (legacy append-file + chunks) folds into one chunk
    # in the export, filtered to the snapshot point
    import json
    arch_lines = [json.dumps(rec) for rec in tl.archived_records()
                  if rec.get("timestamp", "") <= latest]
    if arch_lines:
        dst_arch_dir = os.path.join(target_path, ".hoodie", "archived")
        os.makedirs(dst_arch_dir, exist_ok=True)
        with open(os.path.join(dst_arch_dir, "chunk-export.jsonl"),
                  "w") as out:
            out.write("\n".join(arch_lines) + "\n")
    src_hoodie = os.path.join(table.base_path, ".hoodie")
    for fn in sorted(os.listdir(src_hoodie)):
        p = os.path.join(src_hoodie, fn)
        if os.path.isfile(p) and fn.startswith("hoodie.properties"):
            shutil.copy2(p, os.path.join(target_path, ".hoodie", fn))
