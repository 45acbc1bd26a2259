"""The storage atomicity contract (storage.AtomicStorage): exactly three
sites in the engine depend on a storage primitive from the seam — commit
publish (put_atomic), multi-writer lock acquire (put_if_absent), and lock
release (delete_if_exists). A recording object-store-style adapter
(single-PUT emulation, NO rename available) drives a full multi-writer
table lifecycle to prove (a) nothing else routes around the seam and
(b) rename-style atomicity is not required."""

import os

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark import storage as st
from hoodie_spark import timeline as tl
from hoodie_spark.config import WriteConcurrencyMode, WriteConfig

SF_DIR = "/root/testdata/sf0.001"


class RecordingObjectStore(st.AtomicStorage):
    """Emulates an object store: put_atomic is a single whole-object PUT
    (no temp file, no rename — atomic by API contract), put_if_absent is
    a conditional create. Records every call."""

    def __init__(self):
        self.atomic_puts: list[str] = []
        self.conditional_puts: list[str] = []
        self.deletes: list[str] = []

    def put_atomic(self, path, payload):
        self.atomic_puts.append(path)
        with open(path, "wb") as f:  # single PUT: whole object, one shot
            f.write(payload)

    def put_if_absent(self, path, payload):
        self.conditional_puts.append(path)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def delete_if_exists(self, path):
        self.deletes.append(path)
        try:
            os.remove(path)
        except FileNotFoundError:
            return False
        return True


@pytest.fixture()
def recording_store():
    rec = RecordingObjectStore()
    orig = st.ATOMIC
    st.ATOMIC = rec
    yield rec
    st.ATOMIC = orig


def test_two_sites_only_and_no_rename_needed(spark, orders, tmp_table_path,
                                             recording_store):
    """Full lifecycle on the adapter: create, bulk_insert, upsert (OCC
    lock + conflict check), delete, a table service, reads. Every
    put_atomic must be a timeline instant file; every put_if_absent must
    be the table lock. Results stay correct without any rename."""
    tbl = HoodieTable.create(
        spark, tmp_table_path, "atomicity", ["o_orderkey"], "o_orderdate",
        partition_expr="cast(year(o_orderdate) as string)",
        write_config=WriteConfig(
            concurrency_mode=WriteConcurrencyMode.OPTIMISTIC))
    tbl.bulk_insert(orders)
    n = orders.count()
    tbl.upsert(orders.limit(40).withColumn("o_orderstatus", F.lit("A")))
    tbl.delete(orders.limit(5).select("o_orderkey"))
    from hoodie_spark.services.clean import clean
    clean(tbl)
    snap = tbl.snapshot()
    assert snap.count() == n - 5
    assert snap.filter("o_orderstatus = 'A'").count() == 35

    assert recording_store.atomic_puts, "publish never hit the seam"
    meta = os.path.join(tmp_table_path, ".hoodie") + os.sep
    timeline_dir = os.path.join(tmp_table_path, ".hoodie", "timeline")
    for p in recording_store.atomic_puts:
        assert p.startswith(meta), f"atomic put outside .hoodie: {p}"
        assert p.endswith(".json"), f"atomic put is not an instant: {p}"
    # the publish site really is the timeline (not some side channel)
    assert any(os.path.dirname(p) == timeline_dir or
               os.path.dirname(p) == os.path.join(tmp_table_path, ".hoodie")
               for p in recording_store.atomic_puts)

    assert recording_store.conditional_puts, "lock never hit the seam"
    lock = os.path.join(tmp_table_path, ".hoodie", ".lock")
    assert set(recording_store.conditional_puts) == {lock}
    # release also routes through the adapter (never a bare os.remove),
    # and only ever deletes the lock key
    assert recording_store.deletes, "lock release never hit the seam"
    assert set(recording_store.deletes) == {lock}


def test_conditional_put_contention(tmp_table_path, recording_store):
    """Two writers racing the same lock: exactly one conditional create
    wins; the loser blocks until release, then acquires."""
    os.makedirs(os.path.join(tmp_table_path, ".hoodie"), exist_ok=True)
    a = tl.LockProvider(tmp_table_path, timeout_s=5)
    b = tl.LockProvider(tmp_table_path, timeout_s=0.3)
    with a:
        with pytest.raises(TimeoutError):
            b.__enter__()
    with b:  # released by a's exit — acquirable again
        pass
    assert recording_store.conditional_puts.count(
        os.path.join(tmp_table_path, ".hoodie", ".lock")) >= 3
