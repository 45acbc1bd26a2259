"""Space-filling-curve clustering layout: key math + end-to-end pruning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, WriteConfig
from hoodie_spark.reader import prune_by_stats
from hoodie_spark.services.layout import (
    _hilbert_pandas, with_curve_key, zorder_key)


def test_hilbert_unit_square_order():
    # bits=1: the 4-cell Hilbert curve visits (0,0),(0,1),(1,1),(1,0)
    fn = _hilbert_pandas(1)
    xs, ys = pd.Series([0, 0, 1, 1]), pd.Series([0, 1, 1, 0])
    assert list(fn(xs, ys)) == [0, 1, 2, 3]
    # bits=2: endpoints of the 16-cell curve
    fn2 = _hilbert_pandas(2)
    assert list(fn2(pd.Series([0, 3]), pd.Series([0, 0]))) == [0, 15]


def test_zorder_bit_interleave(spark):
    df = spark.createDataFrame([(3, 1)], ["x", "y"])
    out = df.select(zorder_key([F.col("x").cast("long"),
                                F.col("y").cast("long")], bits=2)
                    .alias("z")).first().z
    # x bits (0b11) at even positions, y bits (0b01) at odd: 0b0111 = 7
    assert out == 7


def test_zorder_locality_beats_linear_on_second_dim(spark):
    # points on a 64x64 grid; files = consecutive runs of the sort order.
    # z-order keeps BOTH dims tight per run; linear keeps only x tight.
    import math
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    z = with_curve_key(df, ["x", "y"], "zorder", bits=6)
    zs = [r.y for r in z.orderBy("__curve").collect()]
    # y-span of each 256-row run: z-order should stay well under 64
    spans = []
    for i in range(0, len(zs), 256):
        run = zs[i:i + 256]
        spans.append(max(run) - min(run))
    assert max(spans) <= 16  # 256 cells = a 16x16 z-block


def _mk(spark, path, orders, stats_cols, layout, sort_cols):
    tbl = HoodieTable.create(
        spark, path, "t", ["o_orderkey"], "o_orderdate",
        partition_expr="'all'",
        write_config=WriteConfig(parquet_max_file_size=64 * 1024,
                                 parquet_small_file_limit=60 * 1024,
                                 stats_columns=list(stats_cols)))
    tbl.bulk_insert(orders)
    tbl.write_config.parquet_max_file_size = 512 * 1024
    tbl.write_config.clustering_small_file_limit = 512 * 1024
    tbl.write_config.clustering_target_file_size = 16 * 1024
    assert tbl.cluster(sort_cols=sort_cols, layout=layout) is not None
    return tbl


def test_zorder_cluster_preserves_content_and_prunes_both_dims(
        spark, orders, tmp_table_path):
    import os
    cols = ["o_custkey", "o_totalprice"]
    lin = _mk(spark, os.path.join(tmp_table_path, "lin"), orders, cols,
              "linear", ["o_custkey"])
    zo = _mk(spark, os.path.join(tmp_table_path, "zo"), orders, cols,
             "zorder", cols)

    # contents unchanged
    got = zo.snapshot().select(*orders.columns)
    assert got.count() == orders.count()
    assert got.exceptAll(orders).count() == 0

    key = orders.first().o_custkey
    price = [("o_totalprice", ">", 450000.0)]
    cust = [("o_custkey", "=", key)]

    def frac(tbl, filt):
        slices = tbl.view().latest_slices()
        return len(prune_by_stats(slices, filt, mor=False)), len(slices)

    z_cust, z_tot = frac(zo, cust)
    z_price, _ = frac(zo, price)
    l_price, l_tot = frac(lin, price)
    assert z_tot >= 4  # enough files for pruning to mean something
    # z-order prunes on BOTH dimensions
    assert z_cust < z_tot and z_price < z_tot
    # the linear layout (sorted by custkey) cannot prune on price at all
    assert l_price == l_tot


def test_hilbert_cluster_preserves_content(spark, orders, tmp_table_path):
    cols = ["o_custkey", "o_totalprice"]
    tbl = _mk(spark, tmp_table_path + "/hil", orders, cols, "hilbert", cols)
    got = tbl.snapshot().select(*orders.columns)
    assert got.count() == orders.count()
    assert got.exceptAll(orders).count() == 0


def test_curve_key_rejects_bad_args(spark, orders):
    with pytest.raises(ValueError):
        with_curve_key(orders, ["o_custkey"], "hilbert")
    with pytest.raises(ValueError):
        with_curve_key(orders, ["o_custkey"], "nope")
