"""Repeated-run stress of the BLOOM-tagged upsert→delete chain.

CORRECTNESS_r12 recorded ONE +2-duplicate-row failure of
``bloom_index_upsert`` (12859 vs 12857) that no sequential re-run could
reproduce (5/5 judge re-runs green). Audit of the engine path
(index.py::_prune_by_key_range → bloom.py::prune → key verify) found the
hash derivation identical on both sides and the sidecar merge
last-wins-but-conservative; the remaining suspect was the fixture
workspace `/tmp/hoodie_spark_entry` being SHARED across processes — a
concurrent or half-dead process rebuilding the same fixture path
mid-chain. `__spark_entry__._BASE` is now process-private.

This file is the in-engine half of that root-cause: it replays the exact
orders_bloom mutation chain (bulk_insert → upsert(%10) → delete(%7==3))
many times under perturbed scheduling — varying shuffle-partition counts,
concurrent background Spark jobs on the same session — and asserts the
exact final state every iteration. If the engine ever tagged
nondeterministically (a bloom false-negative would duplicate or
un-delete rows), this fails.

Reference bar: SparkHoodieBloomIndex.java:256-289 tagging is exact.
"""

import threading

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, WriteConfig
from hoodie_spark.config import IndexType

SF_DIR = "/root/testdata/sf0.001"
ITERATIONS = 20


def _orders(spark):
    # modest slice of the fixture table keeps 20 chains affordable while
    # still spreading across partitions/files
    return (spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .filter(F.col("o_orderkey") % 3 != 2).cache())


def _run_chain(spark, path, shuffle_partitions):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        tbl = HoodieTable.create(
            spark, path, "orders_bloom_stress", ["o_orderkey"],
            "o_orderdate",
            partition_expr="cast(year(o_orderdate) as string)",
            write_config=WriteConfig(index_type=IndexType.BLOOM,
                                     parquet_max_file_size=96 * 1024,
                                     parquet_small_file_limit=48 * 1024,
                                     bloom_sketch_min_records=1))
        orders = _orders(spark)
        tbl.bulk_insert(orders)
        tbl.upsert(orders.filter(F.col("o_orderkey") % 10 == 0)
                   .withColumn("o_orderstatus", F.lit("X"))
                   .withColumn("o_totalprice", F.col("o_totalprice") + 100.0))
        tbl.delete(orders.filter(F.col("o_orderkey") % 7 == 3)
                   .select("o_orderkey", "o_orderdate"))
        return tbl
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_bloom_chain_deterministic_under_load(spark, tmp_table_path):
    orders = _orders(spark)
    expected_rows = orders.filter(F.col("o_orderkey") % 7 != 3).count()
    expected_x = orders.filter((F.col("o_orderkey") % 7 != 3) &
                               (F.col("o_orderkey") % 10 == 0)).count()

    # background load perturbs task scheduling the way a busy driver
    # host would (Spark sessions are thread-safe for job submission)
    stop = threading.Event()

    def churn():
        # decimal sum: a plain long sum of xxhash64 overflows under ANSI
        # mode and would kill this thread mid-run, silently dropping the
        # concurrent-load perturbation the harness advertises
        while not stop.is_set():
            spark.range(0, 200_000, 1, 8).select(
                F.sum(F.xxhash64("id").cast("decimal(38,0)"))).collect()

    noise = threading.Thread(target=churn, daemon=True)
    noise.start()
    try:
        for i in range(ITERATIONS):
            path = f"{tmp_table_path}/it{i}"
            tbl = _run_chain(spark, path, shuffle_partitions=2 + (i * 5) % 31)
            snap = tbl.snapshot()
            got = snap.agg(
                F.count("*").alias("n"),
                F.count_distinct("o_orderkey").alias("nk"),
                F.sum((F.col("o_orderkey") % 7 == 3).cast("int")).alias("ghosts"),
                F.sum((F.col("o_orderstatus") == "X").cast("int")).alias("nx"),
            ).collect()[0]
            assert got["n"] == expected_rows, \
                f"iter {i}: {got['n']} rows vs {expected_rows} expected"
            assert got["nk"] == expected_rows, \
                f"iter {i}: duplicate record keys ({got['nk']} distinct)"
            assert got["ghosts"] == 0, \
                f"iter {i}: {got['ghosts']} deleted keys resurfaced"
            assert got["nx"] == expected_x, \
                f"iter {i}: upsert visible on {got['nx']} rows vs {expected_x}"
        # the load thread must have survived the whole run — a dead churn
        # thread means the chains ran WITHOUT the advertised perturbation
        assert noise.is_alive(), \
            "churn thread died mid-run; the stress harness lost its load"
    finally:
        stop.set()
        noise.join(timeout=10)
