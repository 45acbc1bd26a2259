"""Pre-commit validators: SQL gates run against the would-be post state,
failing writes abort with the table untouched."""

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark.config import WriteConfig
from hoodie_spark.validators import (
    PreCommitValidationError,
    sql_query_equality_validator,
    sql_query_inequality_validator,
    sql_query_single_result_validator,
)


def _table(spark, path, validators):
    return HoodieTable.create(
        spark, path, "orders", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        write_config=WriteConfig(pre_commit_validators=validators))


def test_failed_validator_aborts_and_leaves_table_untouched(
        spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path,
                 [sql_query_equality_validator("SELECT COUNT(*) FROM <TBL>")])
    tbl.write_config.pre_commit_validators = []  # let the load through
    tbl.bulk_insert(orders)
    tbl.write_config.pre_commit_validators = [
        sql_query_equality_validator("SELECT COUNT(*) FROM <TBL>")]
    n = tbl.snapshot().count()
    n_files = sum(len(g.slices) for g in tbl.view().groups.values())

    # a delete changes COUNT(*) -> the equality gate must abort it
    with pytest.raises(PreCommitValidationError):
        tbl.delete(orders.limit(10).select("o_orderkey", "o_orderdate"))
    assert tbl.snapshot().count() == n
    assert sum(len(g.slices) for g in tbl.view().groups.values()) == n_files
    assert tbl.timeline.completed()[-1].action == "commit"

    # an update keeps COUNT(*) -> passes the same gate
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", F.lit("V")))
    assert tbl.snapshot().filter("o_orderstatus = 'V'").count() == 10


def test_single_result_and_inequality_validators(
        spark, orders, tmp_table_path):
    tbl = _table(spark, tmp_table_path, [])
    tbl.bulk_insert(orders)
    # inequality gate: a no-op write (upsert of identical rows) still
    # changes nothing in SUM(o_totalprice) -> must fail
    tbl.write_config.pre_commit_validators = [
        sql_query_inequality_validator(
            "SELECT CAST(SUM(o_totalprice) AS DECIMAL(18,2)) FROM <TBL>")]
    with pytest.raises(PreCommitValidationError):
        tbl.upsert(orders.limit(5))
    tbl.upsert(orders.limit(5).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0))

    # single-result: no nulls may appear in o_orderstatus
    tbl.write_config.pre_commit_validators = [
        sql_query_single_result_validator(
            "SELECT COUNT(*) FROM <TBL> WHERE o_orderstatus IS NULL", 0)]
    with pytest.raises(PreCommitValidationError):
        tbl.upsert(orders.limit(3).withColumn(
            "o_orderstatus", F.lit(None).cast("string")))
    tbl.upsert(orders.limit(3).withColumn("o_orderstatus", F.lit("OK")))
