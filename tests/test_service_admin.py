"""Service administration (services/admin.py) — the
HoodieCompactionAdminTool operations mapped onto the plan-inside-txn
design: pending-instant inspection, validation, unscheduling, and
per-operation compaction-plan file checks."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, TableType, WriteConfig
from hoodie_spark import timeline as tl
from hoodie_spark.services import (pending_instants, unschedule_pending,
                                   validate_compaction_plan,
                                   validate_pending)


def make_orders(spark, path, **kw):
    return HoodieTable.create(
        spark, path, "orders", recordkey_fields=["o_orderkey"],
        precombine_field="o_orderdate",
        partition_expr="date_format(o_orderdate,'yyyy')", **kw)


def _dead_pending(tbl, action=tl.COMMIT):
    """A pending instant whose writer 'died': requested+inflight on the
    timeline, heartbeat written then gone stale (expiry 0.2s)."""
    ts = tbl.timeline.new_instant_time()
    hb = tl.Heartbeat(tbl.base_path)
    hb.refresh(ts)
    tbl.timeline.create_requested(action, ts)
    tbl.timeline.transition_inflight(action, ts)
    time.sleep(0.25)
    return ts


def test_pending_empty_on_clean_table(spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path)
    tbl.bulk_insert(orders.limit(100))
    assert pending_instants(tbl) == []
    assert validate_pending(tbl) == []


def test_validate_flags_dead_writer(spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=0.2,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(100))
    ts = _dead_pending(tbl)
    pend = pending_instants(tbl)
    assert [p.timestamp for p in pend] == [ts]
    assert not pend[0].heartbeat_live
    res = validate_pending(tbl)
    assert len(res) == 1 and not res[0].valid
    assert "heartbeat expired" in res[0].issues[0]


def test_unschedule_removes_instant_and_partial_files(
        spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=0.2,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(100))
    ts = _dead_pending(tbl)
    # partial output the dead writer left behind (instant-stamped name)
    part = sorted(tbl.view().partitions())[0]
    partial = os.path.join(tbl.base_path, part, f"f0-0_0_{ts}.parquet")
    with open(partial, "wb") as f:
        f.write(b"partial")
    # dry_run reports without deleting
    would = unschedule_pending(tbl, ts, dry_run=True)
    assert would and os.path.exists(partial)
    deleted = unschedule_pending(tbl, ts)
    assert sorted(deleted) == sorted(would)
    assert not os.path.exists(partial)
    assert pending_instants(tbl) == []
    # the table still reads fine after the unschedule
    assert tbl.snapshot().count() == 100


def test_unschedule_refuses_live_heartbeat(spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=60.0,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(100))
    ts = tbl.timeline.new_instant_time()
    tl.Heartbeat(tbl.base_path).refresh(ts)  # live for 60s
    tbl.timeline.create_requested(tl.COMMIT, ts)
    tbl.timeline.transition_inflight(tl.COMMIT, ts)
    with pytest.raises(RuntimeError, match="LIVE heartbeat"):
        unschedule_pending(tbl, ts)
    assert unschedule_pending(tbl, ts, force=True) == []
    assert pending_instants(tbl) == []


def test_unschedule_unknown_instant(spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path)
    tbl.bulk_insert(orders.limit(50))
    with pytest.raises(ValueError, match="no pending instant"):
        unschedule_pending(tbl, "99999999999999")


def test_validate_compaction_plan_clean_and_drifted(
        spark, orders, tmp_table_path):
    tbl = make_orders(spark, tmp_table_path,
                      table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders.limit(200))
    tbl.upsert(orders.limit(80).withColumn("o_orderstatus", F.lit("X")))
    res = validate_compaction_plan(tbl)
    assert res and all(r.valid for r in res)
    # externally delete one planned log file → that operation turns
    # invalid with the missing path named; others stay valid
    view = tbl.view()
    victim = next(sl for sl in view.latest_slices()
                  if sl.log_files_as_of(None))
    lf = victim.log_files_as_of(None)[0]
    os.remove(view.abs(lf.path))
    res2 = validate_compaction_plan(tbl)
    bad = [r for r in res2 if not r.valid]
    assert len(bad) == 1
    assert bad[0].timestamp == f"{victim.partition}/{victim.file_id}"
    assert lf.path in bad[0].issues[0]


def test_admin_sql_procedures(spark, orders, tmp_table_path):
    from hoodie_spark.sql.parser import run_sql
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=0.2,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(100))
    tables = {"orders_adm": tbl}
    empty = run_sql(spark,
                    "CALL show_pending_instants(table => 'orders_adm')",
                    tables)
    assert empty.columns == ["instant", "action", "heartbeat_live"]
    assert empty.count() == 0
    ts = _dead_pending(tbl)
    pend = run_sql(spark,
                   "CALL show_pending_instants(table => 'orders_adm')",
                   tables).collect()
    assert len(pend) == 1 and pend[0].instant == ts
    assert not pend[0].heartbeat_live
    bad = run_sql(spark, "CALL validate_pending(table => 'orders_adm')",
                  tables).collect()
    assert len(bad) == 1 and not bad[0].valid
    run_sql(spark, f"CALL unschedule_pending(table => 'orders_adm', "
                   f"instant => '{ts}')", tables)
    assert pending_instants(tbl) == []


def test_admin_cli_commands(spark, orders, tmp_table_path):
    from hoodie_spark.cli import main as cli_main
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=0.2,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(50))
    assert cli_main([tmp_table_path, "pending"], spark)["pending"] == []
    # a beatless pending instant is expired under ANY expiry — the CLI
    # loads the table with default write_config, so don't rely on the
    # test table's short expiry
    ts = tbl.timeline.new_instant_time()
    tbl.timeline.create_requested(tl.COMMIT, ts)
    tbl.timeline.transition_inflight(tl.COMMIT, ts)
    pend = cli_main([tmp_table_path, "pending"], spark)["pending"]
    assert len(pend) == 1 and pend[0]["timestamp"] == ts
    res = cli_main([tmp_table_path, "validate-pending"], spark)["results"]
    assert not res[0]["valid"]
    out = cli_main([tmp_table_path, "unschedule", ts], spark)
    assert out["dry_run"] is False
    assert cli_main([tmp_table_path, "pending"], spark)["pending"] == []


def test_unschedule_refuses_concurrently_committed_instant(
        spark, orders, tmp_table_path, monkeypatch):
    """TOCTOU guard: if the target instant COMMITS between the liveness
    probe and lock acquisition, unschedule must refuse — sweeping its
    instant-stamped files would delete committed data."""
    tbl = make_orders(spark, tmp_table_path,
                      write_config=WriteConfig(heartbeat_expiry_s=0.2,
                                               failed_writes_policy="lazy"))
    tbl.bulk_insert(orders.limit(50))
    ts = _dead_pending(tbl)
    import hoodie_spark.services.admin as adm
    real_lock = tl.LockProvider

    class _RacingLock(real_lock):
        def __enter__(self):
            out = super().__enter__()
            # the "dead" writer publishes just before we act
            tbl.timeline.complete(tl.COMMIT, ts, {"write_stats": []})
            return out

    monkeypatch.setattr(adm.tl, "LockProvider", _RacingLock)
    with pytest.raises(RuntimeError, match="committed concurrently"):
        unschedule_pending(tbl, ts)
