"""MERGE INTO / UPDATE / DELETE command tests (TestMergeIntoTable.scala
case shapes: basic, conditions, delete clause, insert-only)."""

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable


def make_customer(spark, path):
    return HoodieTable.create(spark, path, "customer",
                              recordkey_fields=["c_custkey"])


def test_merge_into_full(spark, customer, tmp_table_path):
    tbl = make_customer(spark, tmp_table_path)
    tbl.bulk_insert(customer.filter("c_custkey < 100"))
    source = (customer.filter("c_custkey < 130")
              .withColumn("op", F.when(F.col("c_custkey") % 10 == 0, "del")
                          .otherwise("up")))
    (tbl.merge(source, "target.c_custkey = source.c_custkey")
        .when_matched_delete(condition="source.op = 'del'")
        .when_matched_update(set={"c_acctbal": "target.c_acctbal + 1000"})
        .when_not_matched_insert()
        .execute())
    snap = tbl.snapshot()
    # 100 existing - 10 deleted (0,10,..,90) + 30 inserted (100..129)
    assert snap.count() == 100 - 10 + 30
    assert snap.filter("c_custkey % 10 = 0 and c_custkey < 100").count() == 0
    # updated rows got +1000
    base = {r[0]: r[1] for r in customer.select("c_custkey", "c_acctbal").collect()}
    got = {r[0]: r[1] for r in snap.select("c_custkey", "c_acctbal").collect()}
    for k in range(1, 100):
        if k % 10 != 0:
            assert abs(got[k] - (base[k] + 1000)) < 1e-6
    for k in range(100, 130):
        assert abs(got[k] - base[k]) < 1e-6  # inserted as-is


def test_merge_first_clause_wins(spark, customer, tmp_table_path):
    tbl = make_customer(spark, tmp_table_path)
    tbl.bulk_insert(customer.filter("c_custkey < 50"))
    source = customer.filter("c_custkey < 50")
    (tbl.merge(source, "target.c_custkey = source.c_custkey")
        .when_matched_update(condition="source.c_custkey < 10",
                             set={"c_mktsegment": "'FIRST'"})
        .when_matched_update(set={"c_mktsegment": "'SECOND'"})
        .execute())
    snap = tbl.snapshot()
    assert snap.filter("c_mktsegment = 'FIRST'").count() == 10
    assert snap.filter("c_mktsegment = 'SECOND'").count() == 40


def test_merge_insert_only(spark, customer, tmp_table_path):
    tbl = make_customer(spark, tmp_table_path)
    tbl.bulk_insert(customer.filter("c_custkey < 100"))
    (tbl.merge(customer, "target.c_custkey = source.c_custkey")
        .when_not_matched_insert(condition="source.c_acctbal > 0")
        .execute())
    expected = customer.filter("c_custkey >= 100 and c_acctbal > 0").count()
    assert tbl.snapshot().filter("c_custkey >= 100").count() == expected


def test_update_where(spark, customer, tmp_table_path):
    tbl = make_customer(spark, tmp_table_path)
    tbl.bulk_insert(customer)
    tbl.update({"c_acctbal": "c_acctbal * 2"}, where="c_mktsegment = 'BUILDING'")
    snap = tbl.snapshot()
    exp = customer.withColumn(
        "c_acctbal", F.when(F.col("c_mktsegment") == "BUILDING",
                            F.col("c_acctbal") * 2).otherwise(F.col("c_acctbal")))
    cols = ["c_custkey", "c_acctbal"]
    assert sorted(map(tuple, snap.select(cols).collect())) == \
        sorted(map(tuple, exp.select(cols).collect()))


def test_delete_where(spark, customer, tmp_table_path):
    tbl = make_customer(spark, tmp_table_path)
    tbl.bulk_insert(customer)
    tbl.delete_where("c_acctbal < 0")
    assert tbl.snapshot().count() == customer.filter("c_acctbal >= 0").count()
