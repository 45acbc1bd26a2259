"""Native ``spark.read.format(...)`` / ``spark.readStream.format(...)``
support via the PySpark Python DataSource API (Spark 4).

Reference parity: DefaultSource.scala:111-135 (batch relation dispatch on
query type) and HoodieStreamSource.scala:49-169 (streaming source whose
offsets are commit timestamps; each micro-batch is an incremental query
between two offsets, HoodieSourceOffset.scala). The reference implements
these as Scala Relation/Source classes; here the same contract rides
Spark's Python DataSource API:

* planning (``partitions``/``latestOffset``) happens on the DRIVER as a
  pure fold over the timeline manifests — no Spark job, no file listing;
* each InputPartition is ONE FILE SLICE, so executors read base + log
  parquet with pyarrow and resolve the slice locally — the same
  executor-local per-slice merge as HoodieMergeOnReadRDD.scala:72-76,
  with zero shuffle;
* results stream back as Arrow record batches (vectorized, not row tuples).

Usage::

    from hoodie_spark.sources import HoodieDataSource
    spark.dataSource.register(HoodieDataSource)

    df = spark.read.format("hoodie_spark").load(path)        # snapshot
    stream = (spark.readStream.format("hoodie_spark")
              .option("startOffset", "earliest").load(path))

Options: ``queryType`` = snapshot (default) | incremental | read_optimized;
``asOfInstant`` (snapshot time travel); ``beginInstant``/``endInstant``
(incremental range); ``startOffset`` = earliest (default) | latest | an
instant timestamp (streaming).

Known limits (documented, not silent): bootstrap METADATA_ONLY slices are
rejected (their base files carry no meta columns — use
``HoodieTable.snapshot()``), and the fast path for large batch scans
remains ``HoodieTable.snapshot()``, which reads parquet natively JVM-side;
this source trades that for a catalog-free ``format()`` surface and is the
ONLY way to subscribe to a table with ``readStream``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader,
                                    DataSourceStreamArrowWriter,
                                    DataSourceStreamReader, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

from ..config import COMMIT_TIME, OPERATION, RECORD_KEY

__all__ = ["HoodieDataSource"]

_PROPERTIES = "hoodie.properties.json"


@dataclass
class SlicePartition(InputPartition):
    """One file slice = one executor task (no shuffle; the slice's base and
    log files are merged locally, HoodieMergeOnReadRDD.scala:72-76)."""

    base: str | None
    logs: tuple[str, ...]
    begin: str  # exclusive commit-time lower bound ("" = none)
    end: str | None  # inclusive upper bound (None = none)


def _load_table_meta(path: str):
    """(config_dict, schema_json) from the table's properties file — pure
    Python, usable on the driver without a SparkSession. Read through the
    FS seam so driver-side planning works against an object-store
    adapter."""
    from .. import storage

    raw = storage.FS.read_bytes(os.path.join(path, ".hoodie", _PROPERTIES))
    if raw is None:
        raise FileNotFoundError(
            f"not a hoodie table (no {_PROPERTIES}): {path}")
    return json.loads(raw)


def _timeline_view(path: str):
    from ..fsview import FileSystemView
    from ..timeline import Timeline

    tl = Timeline(path)
    return tl, FileSystemView(tl)


def _check_slices(slices):
    for sl in slices:
        if sl.base_file is not None and sl.base_file.bootstrap:
            raise ValueError(
                "hoodie_spark datasource: bootstrap METADATA_ONLY slices "
                "carry no meta columns; read this table via "
                "HoodieTable.snapshot()")
    return slices


def _incremental_slices(path: str, begin: str, end: str | None):
    """Commit-range file planning, mirroring ReadClient.incremental
    (IncrementalRelation.scala:98-116): groups touched in (begin, end],
    latest slice as of end."""
    from ..timeline import DATA_ACTIONS

    tl, view = _timeline_view(path)
    instants = [i for i in tl.completed(DATA_ACTIONS)
                if i.timestamp > begin and (end is None or i.timestamp <= end)]
    if not instants:
        return [], begin
    end_ts = instants[-1].timestamp
    touched: set[tuple[str, str]] = set()
    for inst in instants:
        md = tl.metadata(inst)
        for st in md.get("write_stats", []):
            touched.add((st["partition"], st["file_id"]))
    return _check_slices(view.slices_for_groups(touched, as_of=end_ts)), end_ts


def _slice_partitions(view, slices, begin: str, end: str | None):
    out = []
    for sl in slices:
        base = view.abs(sl.base_file.path) if sl.base_file else None
        logs = tuple(view.abs(lf.path) for lf in sl.log_files_as_of(end))
        out.append(SlicePartition(base, logs, begin, end))
    return out


# --------------------------------------------------------------- executor side

def _arrow_schema(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _conform(table, target):
    """Project/cast an arrow table onto the target schema: evolved columns
    missing from old files become nulls, widened types cast up."""
    import pyarrow as pa

    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table.column(f.name)
            cols.append(col.cast(f.type) if col.type != f.type else col)
        else:
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.table(dict(zip([f.name for f in target], cols)),
                    schema=target)


def _commit_filter(begin: str, end: str | None):
    import pyarrow.dataset as ds

    expr = None
    if begin:
        expr = ds.field(COMMIT_TIME) > begin
    if end is not None:
        e2 = ds.field(COMMIT_TIME) <= end
        expr = e2 if expr is None else (expr & e2)
    return expr


def _resolve_slice(pdf, precombine: str | None):
    """Pandas replica of ReadClient._resolve (the log-scanner fold,
    HoodieMergedLogRecordScanner.java:55-82): delete blocks clear a key,
    records committed after the latest delete re-add it, and among
    survivors the payload picks max ordering value (ties: latest commit)."""
    import pandas as pd

    op = pdf[OPERATION].fillna("I") if OPERATION in pdf.columns else None
    if op is not None:
        dels = pdf.loc[op == "D"]
        last_del = dels.groupby(RECORD_KEY)[COMMIT_TIME].max() if len(dels) \
            else None
        pdf = pdf.loc[op != "D"]
        if last_del is not None and len(last_del):
            ld = pdf[RECORD_KEY].map(last_del)
            pdf = pdf.loc[ld.isna() | (pdf[COMMIT_TIME] > ld.fillna(""))]
    if precombine and precombine in pdf.columns:
        ordv = pdf[precombine]
    else:
        ordv = pd.Series(0, index=pdf.index)
    pdf = (pdf.assign(__ord=ordv)
           .sort_values([COMMIT_TIME], ascending=False, kind="mergesort")
           .sort_values(["__ord"], ascending=False, kind="mergesort",
                        na_position="last")
           .drop_duplicates(subset=[RECORD_KEY], keep="first")
           .drop(columns="__ord"))
    return pdf


def _read_slice(part: SlicePartition, schema: StructType,
                precombine: str | None):
    """Read one slice with pyarrow, resolve locally if it has deltas, and
    yield arrow record batches conforming to the table schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_schema(schema)
    cfilter = _commit_filter(part.begin, part.end)
    if not part.logs:
        if part.base is None:
            return
        t = pq.read_table(part.base, filters=cfilter)
        yield from _conform(t, target).to_batches()
        return

    # dirty slice: full base + logs (≤ end), resolve, THEN commit-filter —
    # the filter applies to the RESOLVED current value, like the reference
    pieces = []
    if part.base is not None:
        t = pq.read_table(part.base)
        if part.end is not None:
            import pyarrow.dataset as ds
            t = t.filter(ds.field(COMMIT_TIME) <= part.end)
        pieces.append(_conform(t, target).append_column(
            OPERATION, pa.array(["I"] * t.num_rows, pa.string())))
    log_target = target.append(pa.field(OPERATION, pa.string()))
    for lp in part.logs:
        t = pq.read_table(lp)
        pieces.append(_conform(t, log_target))
    merged = pa.concat_tables(pieces)
    pdf = _resolve_slice(merged.to_pandas(), precombine)
    if part.begin:
        pdf = pdf.loc[pdf[COMMIT_TIME] > part.begin]
    pdf = pdf[[f.name for f in schema.fields]]
    out = pa.Table.from_pandas(pdf, preserve_index=False)
    yield from _conform(out, target).to_batches()


# ------------------------------------------------------------------- readers

class _HoodieBatchReader(DataSourceReader):
    def __init__(self, path: str, options: dict, schema: StructType,
                 precombine: str | None):
        self.path = path
        self.options = options
        self.schema_ = schema
        self.precombine = precombine

    def partitions(self):
        qt = self.options.get("querytype", "snapshot").lower()
        if qt == "incremental":
            begin = self.options.get("begininstant", "")
            end = self.options.get("endinstant")
            slices, end_ts = _incremental_slices(self.path, begin, end)
            return _slice_partitions(
                _timeline_view(self.path)[1], slices, begin, end_ts)
        as_of = self.options.get("asofinstant")
        _tl, view = _timeline_view(self.path)
        slices = _check_slices(view.latest_slices(as_of=as_of))
        if qt in ("read_optimized", "read-optimized"):
            # base files only (DefaultSource.scala:119-124)
            return [SlicePartition(view.abs(sl.base_file.path), (), "", None)
                    for sl in slices if sl.base_file is not None]
        if qt != "snapshot":
            raise ValueError(f"unknown queryType {qt!r}")
        return _slice_partitions(view, slices, "", as_of)

    def read(self, partition: SlicePartition):
        yield from _read_slice(partition, self.schema_, self.precombine)


class _HoodieStreamReader(DataSourceStreamReader):
    """Offsets ARE commit timestamps (HoodieSourceOffset.scala); each batch
    is the incremental query between two offsets. Planning is a driver-side
    manifest fold; reads are per-slice executor tasks."""

    def __init__(self, path: str, options: dict, schema: StructType,
                 precombine: str | None):
        self.path = path
        self.options = options
        self.schema_ = schema
        self.precombine = precombine

    def _last_instant(self) -> str:
        from ..timeline import Timeline

        last = Timeline(self.path).last_completed()
        return last.timestamp if last else ""

    def initialOffset(self) -> dict:
        start = self.options.get("startoffset", "earliest").lower()
        if start == "earliest":
            return {"ts": ""}
        if start == "latest":
            return {"ts": self._last_instant()}
        return {"ts": self.options["startoffset"]}

    def latestOffset(self) -> dict:
        return {"ts": self._last_instant()}

    def partitions(self, start: dict, end: dict):
        begin, end_ts = start["ts"], end["ts"]
        if begin == end_ts:
            return []
        slices, _ = _incremental_slices(self.path, begin, end_ts)
        return _slice_partitions(
            _timeline_view(self.path)[1], slices, begin, end_ts)

    def read(self, partition: SlicePartition):
        yield from _read_slice(partition, self.schema_, self.precombine)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable commit timestamps; nothing to ack


class HoodieDataSource(DataSource):
    """``format("hoodie_spark")`` batch + streaming source."""

    @classmethod
    def name(cls) -> str:
        return "hoodie_spark"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("hoodie_spark datasource needs .load(<path>) "
                             "or .option('path', ...)")
        return path

    def _meta(self):
        cfg = _load_table_meta(self._path())
        sj = cfg.get("schema_json")
        if not sj:
            raise ValueError("table has no committed schema yet")
        schema = StructType.fromJson(json.loads(sj))
        return cfg, schema

    def schema(self) -> StructType:
        return self._meta()[1]

    def reader(self, schema: StructType) -> DataSourceReader:
        cfg, _ = self._meta()
        return _HoodieBatchReader(
            self._path(), {k.lower(): v for k, v in self.options.items()},
            schema, cfg.get("precombine_field"))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        cfg, _ = self._meta()
        return _HoodieStreamReader(
            self._path(), {k.lower(): v for k, v in self.options.items()},
            schema, cfg.get("precombine_field"))

    def writer(self, schema: StructType, overwrite: bool):
        opts = {k.lower(): v for k, v in self.options.items()}
        if overwrite and "operation" not in opts:
            # SaveMode.Overwrite replaces the WHOLE table (Hudi's
            # DefaultSource maps it to INSERT_OVERWRITE_TABLE); partition-
            # scoped overwrite is opt-in via operation=insert_overwrite
            opts["operation"] = "insert_overwrite_table"
        return _HoodieWriter(self._path(), opts, schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _HoodieStreamWriter(
            self._path(), {k.lower(): v for k, v in self.options.items()},
            schema)



# ---------------------------------------------------------------- writers
class _StageCommit(WriterCommitMessage):
    def __init__(self, files):
        self.files = files


def _staging_fs(table_path: str):
    """(pyarrow FileSystem, normalized .staging dir) for a table path.

    Staging is DATA-plane I/O that runs on EXECUTORS, so it cannot use the
    driver-configured Storage seam (a module global does not travel with
    the pickled task). ``pyarrow.fs`` is the executor-native equivalent:
    ``from_uri`` resolves ``s3://`` / ``gs://`` / local paths to the right
    filesystem on whatever host the task lands on — the same way Spark's
    own scans resolve the table path via Hadoop s3a. Reference parity:
    the reference stages through FileSystem/FSUtils for the same reason
    (hudi-common .../fs/FSUtils.java)."""
    from pyarrow import fs as pafs

    d = table_path.rstrip("/") + "/.hoodie/.staging"
    if "://" in table_path:
        fs, norm = pafs.FileSystem.from_uri(d)
        return fs, norm
    return pafs.LocalFileSystem(), os.path.abspath(d)


def _stage_batches(table_path: str, schema_json: str,
                   iterator) -> _StageCommit:
    """Executor side: stream this task's ARROW record batches into one
    staged parquet under ``<table>/.hoodie/.staging/`` — vectorized end to
    end (DataSourceArrowWriter hands us ``pa.RecordBatch``es straight off
    the JVM Arrow transfer; no row ever materializes as a Python object),
    parallel, nothing moves to the driver. Returns the staged file list
    (original URI form, readable by ``spark.read``) as the commit
    message."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(StructType.fromJson(json.loads(schema_json)))
    fs, d = _staging_fs(table_path)
    fs.create_dir(d, recursive=True)
    name = f"part-{_uuid.uuid4().hex[:16]}.parquet"
    writer = None
    try:
        for batch in iterator:
            t = pa.Table.from_batches([batch])
            if t.schema != target:  # tz / nullability conventions differ
                t = t.cast(target)
            if writer is None:
                writer = pq.ParquetWriter(f"{d}/{name}", target,
                                          filesystem=fs)
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    staged = f"{table_path.rstrip('/')}/.hoodie/.staging/{name}"
    return _StageCommit([staged] if writer is not None else [])


def _norm_staged(table_path: str, files) -> list[str]:
    """Commit-message URIs → filesystem-normalized paths (pyarrow strips
    the scheme; local paths get abspath so set-membership comparisons
    hold)."""
    _, d = _staging_fs(table_path)
    return [f"{d}/{f.rsplit('/', 1)[1]}" for f in files]


def _remove_staged(table_path: str, files) -> None:
    fs, _ = _staging_fs(table_path)
    for f in _norm_staged(table_path, files):
        try:
            fs.delete_file(f)
        except OSError:
            pass  # raced with a concurrent sweep/commit


def _sweep_staging(table_path: str, keep,
                   max_age_sec: float = 86400) -> None:
    """Drop .staging leftovers from FAILED or speculative task attempts —
    their files never appear in any commit message, so commit()/abort()
    would otherwise leak them forever. Only files older than
    ``max_age_sec`` go (default 24 h), and only ones outside ``keep``.
    The age guard is what protects a CONCURRENT writer's in-flight task
    files; a single df.write whose stage-to-commit gap exceeds the TTL
    would lose staged data, so writers expected to run longer must raise
    it via ``.option("stagingTTL", seconds)`` — and bulk loads of that
    size should be using ``table.bulk_insert`` anyway."""
    import time

    from pyarrow import fs as pafs

    fs, d = _staging_fs(table_path)
    keep = set(_norm_staged(table_path, keep))
    cutoff = time.time() - max_age_sec
    try:
        infos = fs.get_file_info(pafs.FileSelector(d, allow_not_found=True))
    except OSError:
        return
    for info in infos:
        if not info.is_file or info.path in keep:
            continue
        mtime = info.mtime.timestamp() if info.mtime else None
        try:
            if mtime is not None and mtime < cutoff:
                fs.delete_file(info.path)
        except OSError:
            pass  # raced with a concurrent sweep/commit


def _staging_ttl(options: dict) -> float:
    return float(options.get("stagingttl", 86400))


def _apply_staged(path: str, options: dict, schema_json: str,
                  files, batch_id=None) -> None:
    """Driver side: run the REAL write path (tagging, small-file packing,
    indexes, timeline) over the staged files, then drop them. Streaming
    replays are skipped via the same streaming_batch_id commit metadata
    as the foreachBatch sink."""
    from pyspark.sql import SparkSession

    # commit() runs on the driver but in a worker thread with no active
    # session bound; getOrCreate() returns the existing driver session
    spark = SparkSession.getActiveSession() or \
        SparkSession.builder.getOrCreate()
    try:
        if not files:
            return
        from ..table import HoodieTable
        tbl = HoodieTable.load(spark, path)
        if batch_id is not None:
            from ..streaming.sink import _last_batch_id
            if batch_id <= _last_batch_id(tbl):
                return  # replayed micro-batch after restart
            tbl._writer.commit_extra["streaming_batch_id"] = int(batch_id)
        df = spark.read.schema(StructType.fromJson(
            json.loads(schema_json))).parquet(*files)
        op = str(options.get("operation", "upsert")).lower()
        dispatch = {"bulk_insert": tbl.bulk_insert, "insert": tbl.insert,
                    "delete": tbl.delete,
                    "insert_overwrite": tbl.insert_overwrite,
                    "insert_overwrite_table": tbl.insert_overwrite_table,
                    "upsert": tbl.upsert}
        if op not in dispatch:
            raise ValueError(f"unknown write operation {op!r}")
        dispatch[op](df)
    finally:
        _remove_staged(path, files)


class _HoodieWriter(DataSourceArrowWriter):
    """``df.write.format("hoodie_spark")`` — the convenience seam of the
    reference's DefaultSource write path (hudi-spark DefaultSource.scala /
    DataSourceUtils.doWriteOperation). Rows travel JVM → executor Python
    as Arrow record batches and are staged vectorized (never per-row);
    the real write path (tagging, packing, indexes, timeline) then runs
    JVM-side over the staged parquet. ``table.bulk_insert`` remains the
    fastest bulk path (no Python hop at all)."""

    def __init__(self, path: str, options: dict, schema: StructType):
        self.path = path
        self.options = dict(options)
        self.schema_json = schema.json()

    def write(self, iterator):
        return _stage_batches(self.path, self.schema_json, iterator)

    def commit(self, messages):
        files = [f for m in messages if m is not None for f in m.files]
        _apply_staged(self.path, self.options, self.schema_json, files)
        _sweep_staging(self.path, [], _staging_ttl(self.options))

    def abort(self, messages):
        _remove_staged(self.path, [f for m in messages or []
                                  for f in (m.files if m is not None else [])])
        _sweep_staging(self.path, [], _staging_ttl(self.options))


class _HoodieStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("hoodie_spark")`` — exactly-once via the
    same streaming_batch_id commit metadata as the foreachBatch sink
    (HoodieStreamingSink.scala:41-97 parity); Arrow-batched like the
    batch writer."""

    def __init__(self, path: str, options: dict, schema: StructType):
        self.path = path
        self.options = dict(options)
        self.schema_json = schema.json()

    def write(self, iterator):
        return _stage_batches(self.path, self.schema_json, iterator)

    def commit(self, messages, batchId):  # noqa: N803 (API name)
        files = [f for m in messages if m is not None for f in m.files]
        _apply_staged(self.path, self.options, self.schema_json, files,
                      batch_id=batchId)
        _sweep_staging(self.path, [], _staging_ttl(self.options))

    def abort(self, messages, batchId):  # noqa: N803
        _remove_staged(self.path, [f for m in messages or []
                                  for f in (m.files if m is not None else [])])
        _sweep_staging(self.path, [], _staging_ttl(self.options))
