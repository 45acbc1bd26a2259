"""Command-line entry points for table inspection and services.

Reference parity: the hudi-cli shell's inspection commands (``commits
show``, ``show files``, ``stats``) and the standalone utility jobs —
HoodieCompactor.java, HoodieCleaner.java, HoodieClusteringJob.java,
HoodieSnapshotExporter.java — each of which is a main() that builds a
Spark context, opens the table, and runs one service.

Usage::

    python -m hoodie_spark.cli <base_path> commits
    python -m hoodie_spark.cli <base_path> files [--partition P]
    python -m hoodie_spark.cli <base_path> stats
    python -m hoodie_spark.cli <base_path> compact
    python -m hoodie_spark.cli <base_path> clean [--retained N]
    python -m hoodie_spark.cli <base_path> cluster [--sort-cols a,b]
    python -m hoodie_spark.cli <base_path> rollback <instant>
    python -m hoodie_spark.cli <base_path> savepoint [<instant>]
    python -m hoodie_spark.cli <base_path> restore <instant>
    python -m hoodie_spark.cli <base_path> export <target> [--format parquet]
    python -m hoodie_spark.cli <base_path> rescale-buckets <count>
    python -m hoodie_spark.cli <base_path> repair-dedup <partition> [--dry-run]
    python -m hoodie_spark.cli <base_path> reclaim
    python -m hoodie_spark.cli <base_path> upgrade|downgrade

Output is one JSON document on stdout (machine-readable, like the
utilities' exit contracts).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hoodie_spark.cli")
    p.add_argument("base_path")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("commits")
    f = sub.add_parser("files")
    f.add_argument("--partition", default=None)
    sub.add_parser("stats")
    sub.add_parser("compact")
    lc = sub.add_parser("logcompact")
    lc.add_argument("--min-log-files", type=int, default=3)
    c = sub.add_parser("clean")
    c.add_argument("--retained", type=int, default=None)
    cl = sub.add_parser("cluster")
    cl.add_argument("--sort-cols", default=None)
    cl.add_argument("--layout", default="linear",
                    choices=["linear", "zorder", "hilbert"])
    an = sub.add_parser("analyze")
    an.add_argument("columns", help="comma-separated column list")
    an.add_argument("--force", action="store_true")
    ci = sub.add_parser("create-index")
    ci.add_argument("column")
    di = sub.add_parser("drop-index")
    di.add_argument("column")
    tt = sub.add_parser("ttl")
    tt.add_argument("--keep-latest", type=int, default=None)
    tt.add_argument("--older-than", default=None)
    r = sub.add_parser("rollback")
    r.add_argument("instant")
    s = sub.add_parser("savepoint")
    s.add_argument("instant", nargs="?", default=None)
    rs = sub.add_parser("restore")
    rs.add_argument("instant")
    e = sub.add_parser("export")
    e.add_argument("target")
    e.add_argument("--format", default="parquet")
    rb = sub.add_parser("rescale-buckets")
    rb.add_argument("count", type=int)
    rd = sub.add_parser("repair-dedup")
    rd.add_argument("partition")
    rd.add_argument("--dry-run", action="store_true")
    ro = sub.add_parser("repair-orphans")
    ro.add_argument("--delete", action="store_true",
                    help="actually remove (default: dry-run listing)")
    ro.add_argument("--max-age", type=float, default=3600.0,
                    help="minimum file age in seconds to qualify")
    ar = sub.add_parser("archive")
    ar.add_argument("--max-active", type=int, default=None,
                    help="completed data instants to keep active")
    sub.add_parser("reclaim")
    sub.add_parser("upgrade")
    sub.add_parser("downgrade")
    # service administration (HoodieCompactionAdminTool parity)
    sub.add_parser("pending")
    sub.add_parser("validate-pending")
    up = sub.add_parser("unschedule")
    up.add_argument("instant")
    up.add_argument("--force", action="store_true")
    up.add_argument("--dry-run", action="store_true")
    return p


def main(argv: list[str] | None = None, spark=None) -> dict:
    """Run one command; returns (and prints) the result dict. ``spark`` is
    injectable for tests; otherwise a local session is created."""
    args = _build_parser().parse_args(argv)
    if spark is None:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[*]")
                 .appName("hoodie_spark_cli")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.ui.enabled", "false").getOrCreate())
    from .table import HoodieTable

    tbl = HoodieTable.load(spark, args.base_path)
    if args.cmd == "commits":
        out = {"commits": tbl.commits()}
    elif args.cmd == "files":
        parts = [args.partition] if args.partition else None
        out = {"files": tbl.files(partitions=parts)}
    elif args.cmd == "stats":
        out = tbl.stats()
    elif args.cmd == "compact":
        inst = tbl.compact()
        out = {"compaction_instant": inst}
    elif args.cmd == "logcompact":
        out = {"logcompaction_instant":
               tbl.logcompact(min_log_files=args.min_log_files)}
    elif args.cmd == "analyze":
        n = tbl.analyze(columns=[c.strip() for c in args.columns.split(",")
                                 if c.strip()], force=args.force)
        out = {"files_analyzed": n}
    elif args.cmd == "create-index":
        tbl.create_secondary_index(args.column)
        out = {"index_created": args.column}
    elif args.cmd == "drop-index":
        tbl.drop_secondary_index(args.column)
        out = {"index_dropped": args.column}
    elif args.cmd == "ttl":
        kw = {}
        if args.keep_latest is not None:
            kw["keep_latest"] = args.keep_latest
        if args.older_than is not None:
            kw["older_than"] = args.older_than
        res = tbl.apply_ttl(**kw)
        out = {"ttl_instant": getattr(res, "instant", res)}
    elif args.cmd == "clean":
        out = {"cleaned": tbl.clean(retained=args.retained)}
    elif args.cmd == "cluster":
        cols = args.sort_cols.split(",") if args.sort_cols else None
        out = {"clustering_instant": tbl.cluster(sort_cols=cols,
                                                 layout=args.layout)}
    elif args.cmd == "rollback":
        tbl.rollback(args.instant)
        out = {"rolled_back": args.instant}
    elif args.cmd == "savepoint":
        out = {"savepoint": tbl.savepoint(args.instant)}
    elif args.cmd == "restore":
        tbl.restore(args.instant)
        out = {"restored_to": args.instant}
    elif args.cmd == "export":
        from .export import export_snapshot

        latest = export_snapshot(tbl, args.target, args.format)
        out = {"exported": args.target, "as_of": latest}
    elif args.cmd == "rescale-buckets":
        from .services import rescale_buckets

        out = {"rescale_instant": rescale_buckets(tbl, args.count),
               "num_buckets": args.count}
    elif args.cmd == "repair-dedup":
        from .services.repair import repair_deduplicate

        res = repair_deduplicate(tbl, args.partition, dry_run=args.dry_run)
        out = {"duplicate_keys": res} if args.dry_run else \
            {"repair_instant": res}
    elif args.cmd == "repair-orphans":
        from .services.repair import repair_orphan_files

        orphans = repair_orphan_files(tbl, dry_run=not args.delete,
                                      max_age_s=args.max_age)
        out = {"orphans": orphans, "deleted": bool(args.delete)}
    elif args.cmd == "archive":
        kw = {}
        if args.max_active is not None:
            kw["max_active"] = args.max_active
        out = {"archived": tbl.archive(**kw)}
    elif args.cmd == "reclaim":
        from .services.rollback import rollback_failed_writes

        out = {"reclaimed": rollback_failed_writes(tbl)}
    elif args.cmd == "pending":
        from .services.admin import pending_instants

        out = {"pending": [vars(p) for p in pending_instants(tbl)]}
    elif args.cmd == "validate-pending":
        from .services.admin import validate_pending

        out = {"results": [vars(r) for r in validate_pending(tbl)]}
    elif args.cmd == "unschedule":
        from .services.admin import unschedule_pending

        deleted = unschedule_pending(tbl, args.instant, force=args.force,
                                     dry_run=args.dry_run)
        out = {"deleted_files": deleted, "dry_run": args.dry_run}
    elif args.cmd == "upgrade":
        out = {"stats_touched": tbl.upgrade(),
               "version": tbl.config.version}
    else:
        out = {"stats_touched": tbl.downgrade(),
               "version": tbl.config.version}
    print(json.dumps(out, default=str))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
