"""SQL-text DML front-end tests, mirroring the reference's
TestMergeIntoTable.scala cases as raw SQL strings (basic :25, ignored
record :115, conditions/delete clause, star expansion) plus UPDATE /
DELETE / TRUNCATE statements (UpdateHoodieTableCommand.scala,
TruncateHoodieTableCommand.scala)."""

import pytest

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark.sql import parse_merge, run_sql


@pytest.fixture()
def h1(spark, tmp_table_path):
    """Reference-style (id, name, price, ts) table, primaryKey=id."""
    return HoodieTable.create(spark, tmp_table_path, "h1",
                              recordkey_fields=["id"],
                              precombine_field="ts")


def _rows(tbl):
    return sorted(tuple(r) for r in
                  tbl.snapshot().select("id", "name", "price", "ts").collect())


def test_merge_basic_lifecycle(spark, h1):
    """TestMergeIntoTable.scala:25 'Test MergeInto Basic', all four merges."""
    tables = {"h1": h1}
    # seed the schema (create-table DDL equivalent)
    h1.bulk_insert(spark.sql(
        "select 0 as id, 'seed' as name, cast(0 as double) as price, "
        "0 as ts").limit(0))

    run_sql(spark, """
        merge into h1
        using (
         select 1 as id, 'a1' as name, 10.0 as price, 1000 as ts, '1' as flag
        ) s0
        on s0.id = h1.id
        when matched and flag = '1' then update set
        id = s0.id, name = s0.name, price = s0.price, ts = s0.ts
        when not matched and flag = '1' then insert *
    """, tables)
    assert _rows(h1) == [(1, "a1", 10.0, 1000)]

    run_sql(spark, """
        merge into h1
        using (
         select 1 as id, 'a1' as name, 10.0 as price, 1001 as ts
        ) s0
        on s0.id = h1.id
        when matched then update set
        id = s0.id, name = s0.name, price = s0.price + h1.price, ts = s0.ts
        when not matched then insert *
    """, tables)
    assert _rows(h1) == [(1, "a1", 20.0, 1001)]

    run_sql(spark, """
        merge into h1
        using (
         select * from (
         select 1 as id, 'a1' as name, 10.0 as price, 1002 as ts
         union all
         select 2 as id, 'a2' as name, 12.0 as price, 1001 as ts
         )
        ) s0
        on s0.id = h1.id
        when matched then update set
        id = s0.id, name = s0.name, price = s0.price + h1.price, ts = s0.ts
        when not matched and id % 2 = 0 then insert *
    """, tables)
    assert _rows(h1) == [(1, "a1", 30.0, 1002), (2, "a2", 12.0, 1001)]

    run_sql(spark, """
        merge into h1
        using (
         select 1 as id, 'a1' as name, 12.0 as price, 1003 as ts
        ) s0
        on s0.id = h1.id
        when matched and id != 1 then update set
           id = s0.id, name = s0.name, price = s0.price, ts = s0.ts
        when matched and id = 1 then delete
        when not matched then insert *
    """, tables)
    assert h1.snapshot().filter("id = 1").count() == 0


def test_merge_ignored_record(spark, h1):
    """TestMergeIntoTable.scala:115: a source row matching no clause
    condition is ignored entirely."""
    h1.bulk_insert(spark.sql("select 1 as id, 'a1' as name, "
                             "10.0 as price, 1000 as ts"))
    spark.sql("select 1 as id, 'a1u' as name, 11.0 as price, 1001 as ts "
              "union all "
              "select 2 as id, 'a2' as name, 12.0 as price, 1002 as ts"
              ).createOrReplaceTempView("src_v")
    run_sql(spark, """
        merge into h1 as t
        using src_v s0
        on s0.id = t.id
        when matched and s0.id = 99 then update set *
        when not matched and s0.id = 99 then insert *
    """, {"h1": h1})
    assert _rows(h1) == [(1, "a1", 10.0, 1000)]


def test_merge_star_expansion(spark, h1):
    """update set * / insert * expand to target data columns from source."""
    h1.bulk_insert(spark.sql("select 1 as id, 'a1' as name, "
                             "10.0 as price, 1000 as ts"))
    run_sql(spark, """
        merge into h1
        using (select 1 as id, 'a1u' as name, 11.0 as price, 1001 as ts
               union all
               select 3 as id, 'a3' as name, 13.0 as price, 1003 as ts) s0
        on s0.id = h1.id
        when matched then update set *
        when not matched then insert *
    """, {"h1": h1})
    assert _rows(h1) == [(1, "a1u", 11.0, 1001), (3, "a3", 13.0, 1003)]


def test_update_delete_truncate_text(spark, h1):
    h1.bulk_insert(spark.sql(
        "select id, concat('n', id) as name, cast(id as double) as price, "
        "1000 as ts from range(10)"))
    run_sql(spark, "update h1 set price = price * 2 where id >= 5", {"h1": h1})
    got = {r[0]: r[1] for r in
           h1.snapshot().select("id", "price").collect()}
    assert got[4] == 4.0 and got[7] == 14.0
    run_sql(spark, "delete from h1 where id < 3", {"h1": h1})
    assert h1.snapshot().count() == 7
    run_sql(spark, "truncate table h1", {"h1": h1})
    assert h1.snapshot().count() == 0
    assert [n for n, _ in h1.data_columns()] == ["id", "name", "price", "ts"]
    # still writable after truncate
    h1.upsert(spark.sql("select 9 as id, 'back' as name, 1.0 as price, "
                        "1 as ts"))
    assert h1.snapshot().count() == 1


def test_alter_table_text(spark, h1):
    import pytest as _pytest

    h1.bulk_insert(spark.sql("select 1 as id, 'a1' as name, "
                             "10.0 as price, 1000 as ts"))
    tables = {"h1": h1}
    run_sql(spark, "alter table h1 add columns (tag string, score double)",
            tables)
    assert dict(h1.data_columns())["tag"] == "string"
    snap = h1.snapshot()
    assert snap.filter("tag is null and score is null").count() == 1

    # compatible type widening: old files read through the widened schema
    run_sql(spark, "alter table h1 change column ts ts bigint", tables)
    assert dict(h1.data_columns())["ts"] == "bigint"
    assert h1.snapshot().select("ts").collect()[0][0] == 1000
    h1.upsert(spark.sql("select 2 as id, 'a2' as name, 2.0 as price, "
                        "cast(8589934592 as bigint) as ts"))
    got = {r[0]: r[1] for r in h1.snapshot().select("id", "ts").collect()}
    assert got == {1: 1000, 2: 8589934592}

    # incompatible narrowing / renames are rejected as in the reference
    with _pytest.raises(ValueError, match="incompatible"):
        run_sql(spark, "alter table h1 change column ts ts int", tables)
    with _pytest.raises(ValueError, match="change column name"):
        run_sql(spark, "alter table h1 change column name label string",
                tables)

    run_sql(spark, "alter table h1 rename to h1_renamed", tables)
    assert h1.config.name == "h1_renamed"
    # reload from disk sees the new name
    reloaded = HoodieTable.load(spark, h1.base_path)
    assert reloaded.config.name == "h1_renamed"


def test_create_table_and_insert_text(spark, tmp_table_path):
    """CREATE TABLE ... USING hudi + INSERT INTO / OVERWRITE / VALUES
    (CreateHoodieTableCommand.scala, InsertIntoHoodieTableCommand.scala)."""
    from hoodie_spark.config import TableType

    tables = {}
    tbl = run_sql(spark, f"""
        create table h2 (
          id int, name string, price double, ts long
        ) using hudi
        location '{tmp_table_path}/h2'
        options ( primaryKey = 'id', preCombineField = 'ts' )
    """, tables)
    assert tables["h2"] is tbl
    assert tbl.config.recordkey_fields == ["id"]
    assert tbl.config.precombine_field == "ts"
    assert [n for n, _ in tbl.data_columns()] == ["id", "name", "price", "ts"]

    run_sql(spark, "insert into h2 values (1, 'a', 1.5, 100)", tables)
    run_sql(spark, "insert into h2 select 2 as id, 'b' as name, "
                   "2.5 as price, cast(200 as long) as ts", tables)
    assert sorted(tuple(r) for r in tbl.snapshot()
                  .select("id", "name", "price", "ts").collect()) == \
        [(1, "a", 1.5, 100), (2, "b", 2.5, 200)]
    run_sql(spark, "insert overwrite table h2 select 9 as id, 'z' as name, "
                   "9.0 as price, cast(900 as long) as ts", tables)
    assert [tuple(r) for r in tbl.snapshot()
            .select("id", "name", "price", "ts").collect()] == \
        [(9, "z", 9.0, 900)]

    # CTAS + MOR type option
    t2 = run_sql(spark, f"""
        create table h3 using hudi location '{tmp_table_path}/h3'
        options (primaryKey = 'id', preCombineField = 'ts', type = 'mor')
        as select 5 as id, 'c' as name, 0.5 as price, cast(1 as long) as ts
    """, tables)
    assert t2.config.table_type == TableType.MERGE_ON_READ
    assert t2.snapshot().count() == 1

    # partitioned create
    t3 = run_sql(spark, f"""
        create table h4 (id int, dt string, v double) using hudi
        location '{tmp_table_path}/h4'
        options (primaryKey = 'id') partitioned by (dt)
    """, tables)
    assert t3.config.partition_fields == ["dt"]
    run_sql(spark, "insert into h4 values (1, '2024-01-01', 0.5)", tables)
    assert t3.snapshot().count() == 1


def test_parse_merge_structure():
    p = parse_merge("""
        merge into db.tgt as t
        using (select 1 as a) src
        on src.a = t.a
        when matched and t.a > 0 then update set a = src.a
        when matched then delete
        when not matched then insert (a) values (src.a)
    """)
    assert p["target"] == "db.tgt" and p["target_alias"] == "t"
    assert p["source_is_query"] and p["source_alias"] == "src"
    assert p["on"].strip() == "src.a = t.a"
    kinds = [(c[0], c[1]) for c in p["clauses"]]
    assert kinds == [("update", True), ("delete", True), ("insert", False)]
    assert p["clauses"][0][3] == {"a": "src.a"}
    assert p["clauses"][2][3] == {"a": "src.a"}


def test_merge_mor_partitioned_text(spark, tmp_table_path):
    """TestMergeIntoTable.scala:193 'Test MergeInto for MOR table': MOR +
    partitioned create, insert-only merge with condition, conditional
    update that doesn't fire, then one that does, then delete."""
    tables = {}
    run_sql(spark, f"""
        create table hm (
          id int, name string, price double, ts long, dt string
        ) using hudi
        options ( type = 'mor', primaryKey = 'id', preCombineField = 'ts' )
        partitioned by (dt)
        location '{tmp_table_path}/hm'
    """, tables)

    run_sql(spark, """
        merge into hm as t0
        using (select 1 as id, 'a1' as name, 10.0 as price, 1000 as ts,
                      '2021-03-21' as dt) as s0
        on t0.id = s0.id
        when not matched and s0.id % 2 = 1 then insert *
    """, tables)
    tbl = tables["hm"]

    def rows():
        return sorted(tuple(r) for r in tbl.snapshot()
                      .select("id", "name", "price", "dt").collect())
    assert rows() == [(1, "a1", 10.0, "2021-03-21")]

    # matched-condition does NOT fire -> unchanged
    run_sql(spark, """
        merge into hm as t0
        using (select 1 as id, 'a1' as name, 12.0 as price, 1001 as ts,
                      '2021-03-21' as dt) as s0
        on t0.id = s0.id
        when matched and id % 2 = 0 then update set *
    """, tables)
    assert rows() == [(1, "a1", 10.0, "2021-03-21")]

    # fires -> updated
    run_sql(spark, """
        merge into hm as t0
        using (select 1 as id, 'a1' as name, 12.0 as price, 1001 as ts,
                      '2021-03-21' as dt) as s0
        on t0.id = s0.id
        when matched and id % 2 = 1 then update set *
    """, tables)
    assert rows() == [(1, "a1", 12.0, "2021-03-21")]

    run_sql(spark, """
        merge into hm t0
        using (select 1 as id) s0
        on t0.id = s0.id
        when matched then delete
    """, tables)
    assert rows() == []


def test_change_column_mor_deltas(spark, tmp_table_path):
    """Widening must hold across MOR delta files and survive compaction."""
    from hoodie_spark import TableType

    t = HoodieTable.create(spark, tmp_table_path, "m", ["id"], "ts",
                           table_type=TableType.MERGE_ON_READ)
    t.bulk_insert(spark.sql("select 1 as id, 10 as v, cast(1 as int) as ts"))
    t.upsert(spark.sql("select 1 as id, 20 as v, cast(2 as int) as ts"))
    t.change_column("v", "bigint")
    assert dict(t.data_columns())["v"] == "bigint"
    assert t.snapshot().select("v").collect()[0][0] == 20
    t.upsert(spark.sql("select 2 as id, cast(8589934592 as bigint) as v, "
                       "cast(3 as int) as ts"))
    t.compact()
    got = {r.id: r.v for r in t.snapshot().select("id", "v").collect()}
    assert got == {1: 20, 2: 8589934592}


def test_merge_not_matched_by_source_rejected():
    with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE"):
        parse_merge("""
            merge into t using s on t.id = s.id
            when not matched by source then delete
        """)


def test_merge_case_when_in_action(spark, h1):
    """A CASE WHEN inside an UPDATE SET body must not split the WHEN-clause
    list (the reference SQL surface accepts CASE expressions in merge
    actions)."""
    h1.bulk_insert(spark.sql(
        "select id, concat('n', id) as name, cast(id as double) as price, "
        "1000 as ts from range(4)"))
    run_sql(spark, """
        merge into h1 as t
        using (select 1 as id, 'x' as name, -3.0 as price, 1001 as ts
               union all
               select 9 as id, 'nine' as name, 9.0 as price, 1001 as ts) s
        on t.id = s.id
        when matched then update set
            name = s.name,
            price = case when s.price > 0 then s.price else 0 end,
            ts = s.ts
        when not matched then insert *
    """, {"h1": h1})
    got = {r[0]: (r[1], r[2]) for r in
           h1.snapshot().select("id", "name", "price").collect()}
    assert got[1] == ("x", 0.0)      # negative price clamped by CASE
    assert got[9] == ("nine", 9.0)   # inserted
    assert got[2] == ("n2", 2.0)     # untouched


def test_merge_case_when_in_condition(spark, h1):
    """CASE WHEN inside a clause condition (before THEN) parses too."""
    h1.bulk_insert(spark.sql("select 1 as id, 'a' as name, 5.0 as price, "
                             "1000 as ts"))
    run_sql(spark, """
        merge into h1 as t
        using (select 1 as id, 'b' as name, 7.0 as price, 1001 as ts) s
        on t.id = s.id
        when matched and case when s.price > 6 then true else false end
            then update set name = s.name, price = s.price, ts = s.ts
    """, {"h1": h1})
    assert _rows(h1) == [(1, "b", 7.0, 1001)]


def test_merge_ambiguous_unqualified_column_raises(spark, h1):
    """An unqualified column on BOTH sides that is not ON-equated is a hard
    error (Spark-analyzer parity): silently resolving source-first would
    turn `SET price = price + 1` into source.price + 1."""
    h1.bulk_insert(spark.sql("select 1 as id, 'a' as name, 5.0 as price, "
                             "1000 as ts"))
    with pytest.raises(ValueError, match="ambiguous column 'price'"):
        run_sql(spark, """
            merge into h1 as t
            using (select 1 as id, 100.0 as price, 1001 as ts) s
            on t.id = s.id
            when matched then update set price = price + 1, ts = s.ts
        """, {"h1": h1})
    # qualified forms work, and ON-equated columns (id) stay usable bare
    run_sql(spark, """
        merge into h1 as t
        using (select 1 as id, 100.0 as price, 1001 as ts) s
        on t.id = s.id
        when matched and id = 1 then update set price = t.price + 1,
            ts = s.ts
    """, {"h1": h1})
    assert _rows(h1) == [(1, "a", 6.0, 1001)]


def test_alter_drop_partition_text(spark, orders, tmp_table_path):
    tbl = HoodieTable.create(
        spark, tmp_table_path, "hdp", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)")
    tbl.bulk_insert(orders)
    n = orders.count()
    parts = sorted(tbl.view().partitions())
    gone = orders.filter(F.year("o_orderdate") == int(parts[0])).count()
    run_sql(spark,
            f"ALTER TABLE hdp DROP PARTITION (yr = '{parts[0]}')",
            {"hdp": tbl})
    assert tbl.snapshot().count() == n - gone
    assert parts[0] not in tbl.view().partitions()
    # it is a replacecommit on the timeline (no data IO)
    assert tbl.timeline.completed()[-1].action == "replacecommit"
