"""Edge cases: empty batches, full-delete, re-insert, unpartitioned ops."""

import os

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable

SF_DIR = "/root/testdata/sf0.001"


def test_empty_upsert_and_delete(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    r = tbl.upsert(orders.filter("o_orderkey < 0"))  # empty batch
    assert r.num_records == 0
    tbl.delete(orders.filter("o_orderkey < 0").select("o_orderkey"))
    assert tbl.snapshot().count() == orders.count()


def test_upsert_into_empty_table(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e2", ["o_orderkey"],
                             "o_orderdate")
    tbl.upsert(orders)  # first write is an upsert, not bulk_insert
    assert tbl.snapshot().count() == orders.count()


def test_delete_everything_then_reinsert(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(100)
    tbl = HoodieTable.create(spark, tmp_table_path, "e3", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    tbl.delete(orders.select("o_orderkey"))
    assert tbl.snapshot().count() == 0
    tbl.upsert(orders)
    assert tbl.snapshot().count() == 100


def test_delete_of_absent_keys_is_noop(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e4", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    ghost = orders.select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"))
    r = tbl.delete(ghost)
    assert tbl.snapshot().count() == orders.count()
    assert tbl.timeline.pending() == []


def test_double_upsert_idempotent_content(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(spark, tmp_table_path, "e5", ["o_orderkey"],
                             "o_orderdate")
    tbl.bulk_insert(orders)
    upd = orders.withColumn("o_orderstatus", F.lit("Q"))
    tbl.upsert(upd)
    tbl.upsert(upd)  # same content again
    snap = tbl.snapshot()
    assert snap.count() == orders.count()
    assert snap.filter("o_orderstatus = 'Q'").count() == orders.count()


def test_mor_full_delete_then_compact(spark, tmp_table_path):
    from hoodie_spark import TableType

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(100)
    tbl = HoodieTable.create(spark, tmp_table_path, "e6", ["o_orderkey"],
                             "o_orderdate", table_type=TableType.MERGE_ON_READ)
    tbl.bulk_insert(orders)
    tbl.delete(orders.select("o_orderkey"))
    assert tbl.snapshot().count() == 0       # merge-on-read view
    tbl.compact()
    assert tbl.snapshot().count() == 0       # survives compaction
    assert tbl.read_optimized().count() == 0  # old base must not resurrect


def test_storage_seam_routes_mutations(spark, orders, tmp_table_path):
    """Write/clean/rollback file mutations must flow through the Storage
    interface (the object-store seam), not raw os calls."""
    from hoodie_spark import HoodieTable
    from hoodie_spark.storage import LocalStorage

    class Counting(LocalStorage):
        def __init__(self):
            self.calls = {"rename": 0, "remove": 0, "listdir": 0,
                          "rmtree": 0, "makedirs": 0}

        def rename(self, src, dst):
            self.calls["rename"] += 1
            super().rename(src, dst)

        def remove(self, path):
            self.calls["remove"] += 1
            super().remove(path)

        def listdir(self, path):
            self.calls["listdir"] += 1
            return super().listdir(path)

        def rmtree(self, path):
            self.calls["rmtree"] += 1
            super().rmtree(path)

        def makedirs(self, path):
            self.calls["makedirs"] += 1
            super().makedirs(path)

    st = Counting()
    tbl = HoodieTable.create(
        spark, tmp_table_path, "orders", recordkey_fields=["o_orderkey"],
        precombine_field="o_orderdate", storage=st)
    small = orders.filter("o_orderkey < 500")
    tbl.bulk_insert(small)
    assert st.calls["rename"] > 0 and st.calls["listdir"] > 0
    r2 = tbl.upsert(small.limit(50))
    tbl.rollback(r2.instant)
    assert st.calls["remove"] > 0
    assert tbl.snapshot().count() == small.count()


def test_snapshot_exporter(spark, orders, tmp_table_path):
    """HoodieSnapshotExporter shapes: parquet + json + hudi outputs,
    _SUCCESS tag, refuses existing target, as-of export."""
    import pytest

    from hoodie_spark import HoodieTable, export_snapshot

    os.makedirs(tmp_table_path)
    src = os.path.join(tmp_table_path, "tbl")
    tbl = HoodieTable.create(spark, src, "orders",
                             recordkey_fields=["o_orderkey"],
                             precombine_field="o_orderdate")
    c1 = tbl.bulk_insert(orders.filter("o_orderkey < 1000")).instant
    tbl.upsert(orders.filter("o_orderkey < 100")
               .withColumn("o_orderstatus", F.lit("E")))

    out = os.path.join(tmp_table_path, "parquet_out")
    export_snapshot(tbl, out, "parquet")
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.parquet(out)
    assert back.count() == tbl.snapshot().count()
    assert not [c for c in back.columns if c.startswith("_hoodie")]
    assert back.filter("o_orderstatus = 'E'").count() == \
        orders.filter("o_orderkey < 100").count()
    with pytest.raises(FileExistsError):
        export_snapshot(tbl, out, "parquet")
    with pytest.raises(ValueError, match="invalid output format"):
        export_snapshot(tbl, out + "2", "csvx")

    # as-of export sees the pre-upsert state
    out1 = os.path.join(tmp_table_path, "asof_out")
    export_snapshot(tbl, out1, "json", as_of=c1)
    assert spark.read.json(out1).filter("o_orderstatus = 'E'").count() == 0

    # hudi-format copy is a loadable table with identical snapshot
    out2 = os.path.join(tmp_table_path, "hudi_out")
    export_snapshot(tbl, out2, "hudi")
    copy = HoodieTable.load(spark, out2)
    assert sorted(tuple(r) for r in
                  copy.snapshot().select("o_orderkey", "o_orderstatus").collect()) == \
        sorted(tuple(r) for r in
               tbl.snapshot().select("o_orderkey", "o_orderstatus").collect())


def test_commit_callbacks(spark, orders, tmp_table_path):
    """HoodieWriteCommitCallback: fired after each successful publish with
    the commit message fields; 'warn' mode swallows callback failures."""
    from hoodie_spark import HoodieTable, WriteConfig

    got = []
    wc = WriteConfig(commit_callbacks=[lambda m: got.append(m)])
    tbl = HoodieTable.create(spark, tmp_table_path, "cbt",
                             recordkey_fields=["o_orderkey"],
                             write_config=wc)
    r1 = tbl.bulk_insert(orders.limit(100))
    r2 = tbl.upsert(orders.limit(10))
    assert [m["commit_time"] for m in got] == [r1.instant, r2.instant]
    assert got[0]["table_name"] == "cbt"
    assert got[0]["operation"] == "bulk_insert"
    assert got[0]["write_stats"] and got[0]["base_path"] == tmp_table_path

    def boom(m):
        raise RuntimeError("callback down")

    wc.commit_callbacks.append(boom)
    # default 'warn': the instant has already published when callbacks run,
    # so a callback failure must not read as a write failure (a retry would
    # double-write); reference's HTTP callback logs failures too
    n = len(tbl.commits())
    tbl.upsert(orders.limit(5))  # fails the callback, not the commit
    assert len(tbl.commits()) == n + 1
    wc.callback_on_commit_error = "raise"
    import pytest
    with pytest.raises(RuntimeError):
        tbl.upsert(orders.limit(5))
    assert len(tbl.commits()) == n + 2  # raised AFTER publish — committed


def test_cli_commands(spark, orders, tmp_table_path):
    """CLI parity with the utility mains: inspection + services + export."""
    from hoodie_spark import HoodieTable
    from hoodie_spark import cli

    tbl = HoodieTable.create(spark, tmp_table_path, "clit",
                             recordkey_fields=["o_orderkey"],
                             precombine_field="o_orderdate")
    tbl.bulk_insert(orders.limit(500))
    tbl.upsert(orders.limit(50).withColumn("o_orderstatus", F.lit("C")))

    out = cli.main([tmp_table_path, "commits"], spark=spark)
    assert len(out["commits"]) == 2
    out = cli.main([tmp_table_path, "stats"], spark=spark)
    assert out["total_records"] == 500
    out = cli.main([tmp_table_path, "files"], spark=spark)
    assert out["files"]
    exp = os.path.join(tmp_table_path + "_exp")
    out = cli.main([tmp_table_path, "export", exp], spark=spark)
    assert os.path.exists(os.path.join(exp, "_SUCCESS"))
    out = cli.main([tmp_table_path, "downgrade"], spark=spark)
    assert out["version"] == 1
    out = cli.main([tmp_table_path, "upgrade"], spark=spark)
    assert out["version"] == 2
    out = cli.main([tmp_table_path, "create-index", "o_custkey"], spark=spark)
    assert out["index_created"] == "o_custkey"
    from hoodie_spark import secondary_index as si
    tbl2 = HoodieTable.load(spark, tmp_table_path)
    assert si.exists(tbl2, "o_custkey")
    out = cli.main([tmp_table_path, "drop-index", "o_custkey"], spark=spark)
    assert not si.exists(tbl2, "o_custkey")
    out = cli.main([tmp_table_path, "logcompact"], spark=spark)
    assert out["logcompaction_instant"] is None  # COW: nothing to merge
    # orphan repair: plant a never-referenced parquet, dry-run lists it,
    # --delete removes it (age 0 so the fresh plant qualifies)
    orphan = os.path.join(tmp_table_path, "deadbeef_0-0-0_00000000000000.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    out = cli.main([tmp_table_path, "repair-orphans", "--max-age", "0"],
                   spark=spark)
    assert out["orphans"] and not out["deleted"] and os.path.exists(orphan)
    out = cli.main([tmp_table_path, "repair-orphans", "--max-age", "0",
                    "--delete"], spark=spark)
    assert out["deleted"] and not os.path.exists(orphan)
    # archive: keep 1 active completed instant, the older one moves to jsonl
    out = cli.main([tmp_table_path, "archive", "--max-active", "1"],
                   spark=spark)
    assert out["archived"] == 1
    out = cli.main([tmp_table_path, "commits"], spark=spark)
    assert len(out["commits"]) == 2  # archived history still folds in
    import shutil
    shutil.rmtree(exp, ignore_errors=True)


def test_snapshot_export_archived_table(spark, orders, tmp_table_path):
    """Hudi-format export of a table whose oldest commits were archived:
    must not try to copy nonexistent active-timeline files, and must carry
    the archive jsonl so the copy's snapshot fold still sees full history."""
    from hoodie_spark import HoodieTable, WriteConfig, export_snapshot
    from hoodie_spark.services.archive import archive

    os.makedirs(tmp_table_path)
    src = os.path.join(tmp_table_path, "tbl")
    tbl = HoodieTable.create(spark, src, "orders",
                             recordkey_fields=["o_orderkey"],
                             precombine_field="o_orderdate",
                             write_config=WriteConfig(max_commits_to_keep=2))
    base = orders.filter("o_orderkey < 2000")
    tbl.bulk_insert(base)
    for k in (3, 5, 7):
        tbl.upsert(base.filter(f"o_orderkey % {k} = 0")
                   .withColumn("o_orderstatus", F.lit(f"A{k}")))
    assert archive(tbl) > 0, "fixture must actually archive instants"

    out = os.path.join(tmp_table_path, "hudi_out")
    export_snapshot(tbl, out, "hudi")
    assert os.path.exists(os.path.join(out, ".hoodie", "archived",
                                       "chunk-export.jsonl"))
    copy = HoodieTable.load(spark, out)
    assert sorted(tuple(r) for r in
                  copy.snapshot().select("o_orderkey", "o_orderstatus").collect()) == \
        sorted(tuple(r) for r in
               tbl.snapshot().select("o_orderkey", "o_orderstatus").collect())


def test_concurrent_independent_table_builds(spark, orders, tmp_table_path):
    """Disjoint tables build correctly from concurrent driver threads —
    the pattern the warehouse bench uses to overlap independent writes.
    Pins that no writer/keygen/storage driver state is shared per-table."""
    from concurrent.futures import ThreadPoolExecutor

    from hoodie_spark import HoodieTable

    def build(i):
        t = HoodieTable.create(spark, os.path.join(tmp_table_path, f"t{i}"),
                               f"ct{i}", recordkey_fields=["o_orderkey"],
                               precombine_field="o_orderdate")
        t.bulk_insert(orders.limit(200))
        return t.snapshot().count(), len(t.commits())

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(build, range(4)))
    assert results == [(200, 1)] * 4
