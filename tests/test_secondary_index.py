"""Secondary index: non-key column value → file-group pruning (public
Hudi-1.0 design; extension beyond this reference snapshot)."""

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark import secondary_index as si


def _table(spark, path):
    return HoodieTable.create(
        spark, path, "orders", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)")


def test_lookup_prunes_to_indexed_groups(spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    tbl.create_secondary_index("o_custkey")
    assert si.exists(tbl, "o_custkey")

    key = orders.first().o_custkey
    expected = orders.filter(F.col("o_custkey") == key).count()
    got = tbl.read_by_column("o_custkey", [key])
    assert got.count() == expected

    # pruning evidence: candidate groups are a strict subset of live groups
    groups = si.lookup_groups(
        tbl, "o_custkey",
        spark.createDataFrame([(key,)], ["value"]))
    n_live = len(tbl.view().latest_slices())
    assert groups and len(groups) < n_live


def test_index_maintained_across_commits(spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    tbl.create_secondary_index("o_custkey")
    # new rows with a brand-new custkey in a NEW partition — the per-commit
    # harvest must make them findable (false negative otherwise)
    fresh = (orders.limit(4)
             .withColumn("o_orderkey", F.col("o_orderkey") + 9_000_000)
             .withColumn("o_custkey", F.lit(987654321).cast("long"))
             .withColumn("o_orderdate", F.expr("o_orderdate + interval 900 days")))
    tbl.upsert(fresh)
    assert tbl.read_by_column("o_custkey", [987654321]).count() == 4

    # updates rewriting a file keep it findable; deleted values only cost
    # I/O (re-filter), never return dropped rows
    key = orders.first().o_custkey
    tbl.delete(orders.filter(F.col("o_custkey") == key)
               .select("o_orderkey", "o_orderdate"))
    assert tbl.read_by_column("o_custkey", [key]).count() == 0

    # compaction drops entries of replaced groups and keeps results exact
    kept = si.compact(tbl, "o_custkey")
    assert kept > 0
    assert tbl.read_by_column("o_custkey", [987654321]).count() == 4


def test_fallback_without_index(spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    tbl.bulk_insert(orders)
    key = orders.first().o_custkey
    expected = orders.filter(F.col("o_custkey") == key).count()
    assert tbl.read_by_column("o_custkey", [key]).count() == expected
