"""Crash recovery end-to-end: a writer process killed mid-write (SIGKILL,
no cleanup code runs) leaves a pending instant + orphan files; once its
heartbeat goes stale, lazy reclamation rolls the zombie back via the
listing-based path and the table serves exactly the pre-crash state."""

import os
import subprocess
import sys
import tempfile
import time

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark.config import WriteConfig

SF_DIR = "/root/testdata/sf0.001"

# The worker begins a write, physically stages data files with the instant
# embedded in their names (what a mid-flight Spark write leaves on disk),
# then SIGKILLs itself before commit — simulating an executor-host loss.
_CRASH_WORKER = """
import os, sys, signal
sys.path.insert(0, sys.argv[2])
from pyspark.sql import SparkSession, functions as F
from hoodie_spark import HoodieTable
from hoodie_spark import timeline as tl
path = sys.argv[1]
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tbl = HoodieTable.load(spark, path)
wc = tbl._writer
instant = wc._begin(tl.COMMIT)
# stage orphan base files the way a dying write does: instant-stamped names
for pp in ("1995", "1996"):
    d = os.path.join(path, pp)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"deadfid-0_{instant}.parquet"), "wb") as f:
        f.write(b"partial")
print(f"INSTANT {instant}", flush=True)
os.kill(os.getpid(), signal.SIGKILL)  # no finally blocks, no heartbeat stop
"""


def test_sigkilled_writer_is_reclaimed(spark, tmp_table_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    tbl = HoodieTable.create(
        spark, tmp_table_path, "crash", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        write_config=WriteConfig(heartbeat_expiry_s=2.0))
    tbl.bulk_insert(orders)
    before = tbl.snapshot().count()

    script = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    script.write(_CRASH_WORKER)
    script.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, script.name, tmp_table_path, repo],
        capture_output=True, text=True, timeout=300)
    assert p.returncode == -9, (p.returncode, p.stderr[-500:])
    instant = p.stdout.split("INSTANT ")[1].split()[0]

    tbl = HoodieTable.load(
        spark, tmp_table_path,
        write_config=WriteConfig(heartbeat_expiry_s=2.0))
    # zombie state: pending instant + orphan files on disk
    assert [i for i in tbl.timeline.pending() if i.timestamp == instant]
    orphans = [os.path.join(tmp_table_path, pp, f"deadfid-0_{instant}.parquet")
               for pp in ("1995", "1996")]
    assert all(os.path.exists(o) for o in orphans)

    from hoodie_spark.services.rollback import rollback_failed_writes
    # heartbeat still fresh (<2 s since the kill) -> NOT reclaimed yet
    if not tbl.timeline.pending():
        raise AssertionError("pending instant vanished early")
    time.sleep(2.5)  # let the dead writer's beat expire
    assert rollback_failed_writes(tbl) == [instant]
    # zombie fully gone: timeline clean, orphan files deleted
    assert not [i for i in tbl.timeline.pending() if i.timestamp == instant]
    assert not any(os.path.exists(o) for o in orphans)
    # table serves exactly the pre-crash state
    snap = tbl.snapshot()
    assert snap.count() == before
    assert snap.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    # a fresh write cycle works after recovery
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", F.lit("R")))
    assert tbl.snapshot().filter("o_orderstatus = 'R'").count() == 10
