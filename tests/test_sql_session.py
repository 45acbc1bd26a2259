"""spark.sql()-native DML via the session interception
(hoodie_spark/sql/session.py; reference HoodieAnalysis.scala:105,184,198 —
MERGE/UPDATE/DELETE typed straight into spark.sql must route to the hoodie
builders while every non-hoodie statement passes through untouched)."""

import pytest

from hoodie_spark import HoodieTable
from hoodie_spark.sql import disable, enable, register_table


@pytest.fixture()
def h1(spark, tmp_table_path):
    t = HoodieTable.create(spark, tmp_table_path, "h1",
                           recordkey_fields=["id"], precombine_field="ts")
    t.bulk_insert(spark.sql(
        "select id, concat('n', id) as name, cast(id as double) as price, "
        "1000 as ts from range(6)"))
    return t


@pytest.fixture(autouse=True)
def _always_restore(spark):
    yield
    disable(spark)


def _rows(tbl):
    return sorted(tuple(r) for r in
                  tbl.snapshot().select("id", "name", "price", "ts").collect())


def test_native_merge_update_delete(spark, h1):
    enable(spark, {"h1": h1})
    spark.sql("""
        MERGE INTO h1 AS t
        USING (select 1 as id, 'one' as name, 11.0 as price, 1001 as ts
               union all
               select 9 as id, 'nine' as name, 9.0 as price, 1001 as ts) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = {r[0]: r[1] for r in h1.snapshot().select("id", "name").collect()}
    assert got[1] == "one" and got[9] == "nine" and got[2] == "n2"

    spark.sql("UPDATE h1 SET price = price * 2 WHERE id >= 5")
    spark.sql("DELETE FROM h1 WHERE id < 2")
    got = {r[0]: r[1] for r in h1.snapshot().select("id", "price").collect()}
    assert 0 not in got and 1 not in got
    assert got[5] == 10.0 and got[9] == 18.0 and got[3] == 3.0


def test_view_refreshes_after_dml(spark, h1):
    """After a routed write, SELECT over the registered name sees the new
    snapshot — catalog-table behavior, not a stale temp view."""
    enable(spark, {"h1": h1})
    assert spark.sql("select count(*) c from h1").collect()[0].c == 6
    spark.sql("DELETE FROM h1 WHERE id < 3")
    assert spark.sql("select count(*) c from h1").collect()[0].c == 3


def test_non_hoodie_statements_pass_through(spark, h1):
    enable(spark, {"h1": h1})
    # plain queries, DDL on temp views, unknown tables: untouched semantics
    assert spark.sql("select 1 + 1 as v").collect()[0].v == 2
    spark.range(3).createOrReplaceTempView("plain_v")
    assert spark.sql("select sum(id) s from plain_v").collect()[0].s == 3
    with pytest.raises(Exception):
        # UPDATE on a non-hoodie relation falls through to Spark's analyzer
        spark.sql("UPDATE plain_v SET id = 1")


def test_create_using_hudi_and_insert(spark, tmp_table_path):
    registry = enable(spark)
    spark.sql(f"""
        CREATE TABLE hsess (id int, name string, ts long) USING hudi
        LOCATION '{tmp_table_path}/hsess'
        OPTIONS (primaryKey = 'id', preCombineField = 'ts')
    """)
    assert "hsess" in registry
    spark.sql("INSERT INTO hsess VALUES (1, 'a', 100)")
    spark.sql("INSERT INTO hsess VALUES (2, 'b', 200)")
    assert spark.sql("select count(*) c from hsess").collect()[0].c == 2
    # CREATE with a non-hudi provider passes through to Spark's catalog
    spark.sql(f"CREATE TABLE plainpq (id int) USING parquet "
              f"LOCATION '{tmp_table_path}/plainpq'")
    try:
        assert "plainpq" not in registry
        spark.sql("INSERT INTO plainpq VALUES (7)")
        assert spark.sql("select id from plainpq").collect()[0].id == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS plainpq")


def test_truncate_and_drop(spark, h1, tmp_table_path):
    registry = enable(spark, {"h1": h1})
    spark.sql("TRUNCATE TABLE h1")
    assert h1.snapshot().count() == 0
    spark.sql("DROP TABLE h1")
    assert "h1" not in registry
    # base path still exists without PURGE
    import os
    assert os.path.exists(h1.base_path)


def test_drop_purge_removes_data(spark, tmp_table_path):
    import os

    t = HoodieTable.create(spark, f"{tmp_table_path}/p", "hp", ["id"])
    t.bulk_insert(spark.sql("select 1 as id, 'x' as v"))
    register_table(spark, t, "hp")
    spark.sql("DROP TABLE hp PURGE")
    assert not os.path.exists(t.base_path)


def test_disable_restores(spark, h1):
    enable(spark, {"h1": h1})
    disable(spark)
    # no interception: UPDATE against the temp view goes to Spark and fails
    with pytest.raises(Exception):
        spark.sql("UPDATE h1 SET price = 0")
    # re-enable keeps the registry
    registry = enable(spark)
    assert "h1" in registry
    spark.sql("UPDATE h1 SET price = 0 WHERE id = 2")
    got = {r[0]: r[1] for r in h1.snapshot().select("id", "price").collect()}
    assert got[2] == 0.0
