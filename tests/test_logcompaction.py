"""Log (minor) compaction: merge delta files without rewriting the base."""

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType


@pytest.fixture()
def mor_many_deltas(spark, orders, tmp_table_path):
    """MOR table with 4 delta commits stacked on the same slices."""
    tbl = HoodieTable.create(
        spark, tmp_table_path, "olc", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    for i in range(4):
        upd = (orders.filter(F.col("o_orderkey") % 4 == i % 4)
               .withColumn("o_orderstatus", F.lit(f"S{i}"))
               .withColumn("o_totalprice", F.col("o_totalprice") + i))
    # noqa: last loop variable reused below intentionally
        tbl.upsert(upd)
    return tbl


def _chk(df):
    return sorted((r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2))
                  for r in df.select("o_orderkey", "o_orderstatus",
                                     "o_totalprice").collect())


def test_logcompact_preserves_snapshot_and_shrinks_log_count(
        spark, mor_many_deltas):
    tbl = mor_many_deltas
    before = _chk(tbl.snapshot())
    max_logs_before = max(len(sl.log_files_as_of(None))
                          for sl in tbl.view().latest_slices())
    assert max_logs_before >= 3

    inst = tbl.logcompact(min_log_files=3)
    assert inst is not None

    after_slices = tbl.view().latest_slices()
    # every compacted slice now reads exactly ONE active delta
    compacted = [sl for sl in after_slices
                 if any(lf.compacted_at for lf in sl.log_files)]
    assert compacted
    for sl in compacted:
        active = sl.log_files_as_of(None)
        assert len(active) == 1 and active[0].instant == inst

    assert _chk(tbl.snapshot()) == before
    # read-optimized untouched (no base rewrite)
    assert all(sl.base_instant < inst for sl in after_slices)


def test_logcompact_time_travel_and_incremental(spark, orders,
                                                mor_many_deltas):
    tbl = mor_many_deltas
    commits = [i.timestamp for i in tbl.timeline.completed()]
    pre = commits[-1]
    before_asof = _chk(tbl.snapshot(as_of=pre))
    inc_before = _chk(tbl.incremental(begin=commits[0], end=commits[2]))

    tbl.logcompact(min_log_files=3)
    # as-of BEFORE the logcompaction still resolves from the originals
    assert _chk(tbl.snapshot(as_of=pre)) == before_asof
    # incremental over a pre-logcompaction range is unchanged
    assert _chk(tbl.incremental(begin=commits[0], end=commits[2])) == inc_before


def test_full_compaction_after_logcompact(spark, mor_many_deltas):
    tbl = mor_many_deltas
    before = _chk(tbl.snapshot())
    assert tbl.logcompact(min_log_files=3) is not None
    assert tbl.compact() is not None
    assert _chk(tbl.read_optimized()) == before
    assert all(not sl.log_files_as_of(None)
               for sl in tbl.view().latest_slices())


def test_logcompact_below_threshold_is_noop(spark, orders, tmp_table_path):
    tbl = HoodieTable.create(
        spark, tmp_table_path, "olc2", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", F.lit("A")))
    assert tbl.logcompact(min_log_files=3) is None


def test_logcompact_rollback_restores_originals(spark, mor_many_deltas):
    tbl = mor_many_deltas
    before = _chk(tbl.snapshot())
    inst = tbl.logcompact(min_log_files=3)
    tbl.rollback(inst)
    slices = tbl.view().latest_slices()
    assert all(lf.compacted_at is None
               for sl in slices for lf in sl.log_files)
    assert _chk(tbl.snapshot()) == before


def test_call_run_logcompaction(spark, mor_many_deltas):
    from hoodie_spark.sql.parser import run_sql

    inst = run_sql(spark, "CALL run_logcompaction(table => 'olc', "
                          "min_log_files => 3)", {"olc": mor_many_deltas})
    assert inst is not None


def test_clean_deletes_superseded_originals(spark, orders, tmp_table_path):
    """Once the logcompaction falls behind the retention horizon, the
    cleaner physically deletes the superseded originals; the merged delta
    keeps serving reads."""
    import os

    tbl = HoodieTable.create(
        spark, tmp_table_path, "olc3", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    for i in range(3):
        tbl.upsert(orders.filter(F.col("o_orderkey") % 3 == i)
                   .withColumn("o_orderstatus", F.lit(f"S{i}")))
    before = _chk(tbl.snapshot())
    assert tbl.logcompact(min_log_files=3) is not None
    originals = [lf.path for sl in tbl.view().latest_slices()
                 for lf in sl.log_files if lf.compacted_at is not None]
    assert originals
    # push the retention horizon past the logcompaction (the P-upserts
    # carry the ORIGINAL status for their keys, legitimately winning)
    touched = {r.o_orderkey for r in orders.limit(5).collect()}
    for i in range(3):
        tbl.upsert(orders.limit(5)
                   .withColumn("o_orderpriority", F.lit(f"P{i}")))
    assert tbl.clean(retained=2) is not None
    for p in originals:
        assert not os.path.exists(os.path.join(tbl.base_path, p)), p
    got = {r.o_orderkey: r.o_orderstatus for r in tbl.snapshot().collect()}
    exp = {k: s for k, s, _p in before}
    # keys not touched by the later P-upserts keep their S-status, served
    # from the merged delta alone
    assert all(got[k] == exp[k] for k in got if k not in touched)
    assert len(got) == len(exp)
