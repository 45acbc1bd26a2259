"""Column-stats data skipping: manifest min/max prune the file list."""

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, WriteConfig

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def stats_table(spark, tmp_table_path):
    """Range-sorted small files so o_totalprice ranges are disjoint-ish."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .withColumn("o_orderkey", F.col("o_orderkey"))
    from pyspark.sql.window import Window

    tbl = HoodieTable.create(
        spark, tmp_table_path, "skip", ["rk"], "o_orderdate",
        write_config=WriteConfig(parquet_max_file_size=64 * 1024,
                                 stats_columns=["o_totalprice"]))
    # record key = zero-padded rank by the stats column, so the global range
    # sort by key produces tight per-file o_totalprice ranges (what
    # clustering by that column yields in production)
    keyed = orders.withColumn(
        "rk", F.lpad(F.row_number().over(Window.orderBy("o_totalprice"))
                     .cast("string"), 6, "0"))
    tbl.bulk_insert(keyed)
    return tbl, orders


def test_skip_filters_prune_and_match(spark, stats_table):
    tbl, orders = stats_table
    from hoodie_spark.reader import prune_by_stats

    all_slices = tbl.view().latest_slices()
    assert len(all_slices) > 3
    assert all(sl.base_file.col_stats for sl in all_slices)

    pruned = prune_by_stats(all_slices, [("o_totalprice", ">", 400000.0)],
                            mor=False)
    assert 0 < len(pruned) < len(all_slices)  # skipped most files

    # results identical with and without skipping
    full = tbl.snapshot().filter("o_totalprice > 400000.0")
    skipped = tbl.snapshot(skip_filters=[("o_totalprice", ">", 400000.0)]) \
                 .filter("o_totalprice > 400000.0")
    assert full.count() == skipped.count() == \
        orders.filter("o_totalprice > 400000.0").count()


def test_skip_between_and_eq(spark, stats_table):
    tbl, orders = stats_table
    n = orders.filter("o_totalprice between 100000 and 150000").count()
    got = tbl.snapshot(
        skip_filters=[("o_totalprice", "between", 100000.0, 150000.0)]) \
        .filter("o_totalprice between 100000 and 150000").count()
    assert got == n


def test_incremental_skip_filters(spark, stats_table):
    tbl, orders = stats_table
    c1 = tbl.timeline.completed()[0].timestamp
    # incremental from the start == whole table; skip filter must not
    # change the (filtered) result
    inc = tbl.incremental(skip_filters=[("o_totalprice", ">", 400000.0)]) \
             .filter("o_totalprice > 400000.0")
    assert inc.count() == orders.filter("o_totalprice > 400000.0").count()
    assert tbl.incremental(begin=c1).count() == 0  # nothing after first commit


def test_expression_stats_prune_and_match(spark, tmp_table_path):
    """stats_exprs (functional-index equivalent): per-file min/max of a SQL
    expression prunes files for skip_filters on the alias."""
    from pyspark.sql.window import Window

    from hoodie_spark.reader import prune_by_stats

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "skipx", ["rk"], "o_orderdate",
        write_config=WriteConfig(
            parquet_max_file_size=64 * 1024,
            stats_exprs={"yr": "year(o_orderdate)"}))
    # key = rank by orderdate -> tight per-file year ranges after the
    # global key sort
    keyed = orders.withColumn(
        "rk", F.lpad(F.row_number().over(Window.orderBy("o_orderdate"))
                     .cast("string"), 6, "0"))
    tbl.bulk_insert(keyed)

    slices = tbl.view().latest_slices()
    assert len(slices) > 3
    assert all(sl.base_file.col_stats and "yr" in sl.base_file.col_stats
               for sl in slices)
    pruned = prune_by_stats(slices, [("yr", "=", 1997)], mor=False)
    assert 0 < len(pruned) < len(slices)

    exp = orders.filter("year(o_orderdate) = 1997").count()
    got = tbl.snapshot(skip_filters=[("yr", "=", 1997)]) \
        .filter("year(o_orderdate) = 1997").count()
    assert got == exp

    # expression stats survive an upsert rewrite of some files
    upd = keyed.limit(20).withColumn("o_orderpriority", F.lit("X"))
    tbl.upsert(upd)
    got2 = tbl.snapshot(skip_filters=[("yr", "=", 1997)]) \
        .filter("year(o_orderdate) = 1997").count()
    assert got2 == exp


def test_analyze_backfills_stats_for_existing_table(spark, tmp_table_path):
    """ANALYZE on a table written WITHOUT stats config: skip_filters prune
    files afterwards, results stay exact, and the sidecar survives
    compaction of dead entries."""
    from pyspark.sql.window import Window

    from hoodie_spark.reader import prune_by_stats
    from hoodie_spark.services.stats import compact_sidecars

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "skipbf", ["rk"], "o_orderdate",
        write_config=WriteConfig(parquet_max_file_size=64 * 1024))
    keyed = orders.withColumn(
        "rk", F.lpad(F.row_number().over(Window.orderBy("o_orderdate"))
                     .cast("string"), 6, "0"))
    tbl.bulk_insert(keyed)
    # no stats configured -> nothing to prune on
    slices = tbl.view().latest_slices()
    assert all(not (sl.base_file.col_stats or {}).get("o_totalprice")
               for sl in slices)

    n = tbl.analyze(columns=["o_totalprice"],
                    exprs={"yr": "year(o_orderdate)"})
    assert n == len(slices)
    assert tbl.analyze(columns=["o_totalprice"]) == 0  # idempotent

    slices = tbl.view().latest_slices()
    assert all("o_totalprice" in sl.base_file.col_stats
               and "yr" in sl.base_file.col_stats for sl in slices)
    pruned = prune_by_stats(slices, [("yr", "=", 1997)], mor=False)
    assert 0 < len(pruned) < len(slices)
    exp = orders.filter("year(o_orderdate) = 1997").count()
    got = tbl.snapshot(skip_filters=[("yr", "=", 1997)]) \
        .filter("year(o_orderdate) = 1997").count()
    assert got == exp

    # rewrite some files; stale sidecar entries are dropped by compaction
    tbl.upsert(keyed.limit(30).withColumn("o_orderpriority", F.lit("X")))
    kept = compact_sidecars(tbl)
    live = {sl.base_file.path for sl in tbl.view().latest_slices()}
    assert 0 < kept <= len(live)
    got2 = tbl.snapshot(skip_filters=[("yr", "=", 1997)]) \
        .filter("year(o_orderdate) = 1997").count()
    assert got2 == exp


def test_analyze_via_call_procedure(spark, tmp_table_path):
    from hoodie_spark.sql.parser import run_sql

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "skipcall", ["o_orderkey"], "o_orderdate",
        write_config=WriteConfig(parquet_max_file_size=64 * 1024))
    tbl.bulk_insert(orders)
    n = run_sql(spark, "CALL run_analyze(table => 'skipcall', "
                       "columns => 'o_totalprice')", {"skipcall": tbl})
    assert n == len(tbl.view().latest_slices())
