"""S3 adapter for the AtomicStorage seam, driven by an in-memory fake that
enforces the real S3 conditional-write protocol (PutObject + IfNoneMatch
-> 412 PreconditionFailed on existing keys, idempotent DeleteObject,
HeadObject 404). The local-backed variant then runs a FULL table
lifecycle + two-writer lock race through the adapter, proving the
engine's three-primitive contract maps onto S3 API calls."""

import os

import pytest

from hoodie_spark import HoodieTable
from hoodie_spark import storage as st
from hoodie_spark import timeline as tl
from hoodie_spark.storage_s3 import S3AtomicStorage

SF_DIR = "/root/testdata/sf0.001"


class _ClientError(Exception):
    def __init__(self, code):
        self.response = {"Error": {"Code": code}}
        super().__init__(code)


class FakeS3Client:
    """In-memory S3: dict of (bucket, key) -> bytes, honoring the
    conditional-write protocol."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.calls: list[tuple] = []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.calls.append(("put", Key, IfNoneMatch))
        if IfNoneMatch == "*" and (Bucket, Key) in self.objects:
            raise _ClientError("PreconditionFailed")
        self.objects[(Bucket, Key)] = bytes(Body)

    def head_object(self, Bucket, Key):
        self.calls.append(("head", Key))
        if (Bucket, Key) not in self.objects:
            raise _ClientError("404")
        import datetime
        return {"LastModified": datetime.datetime.now(datetime.timezone.utc)}

    def delete_object(self, Bucket, Key):
        self.calls.append(("delete", Key))
        self.objects.pop((Bucket, Key), None)


class LocalBackedS3Client(FakeS3Client):
    """Same protocol, but objects land on the local filesystem at Key —
    lets the WHOLE engine run while the three atomic primitives go
    through S3 API calls."""

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
        self.calls.append(("put", Key, IfNoneMatch))
        if IfNoneMatch == "*" and os.path.exists(Key):
            raise _ClientError("PreconditionFailed")
        with open(Key, "wb") as f:
            f.write(bytes(Body))

    def head_object(self, Bucket, Key):
        self.calls.append(("head", Key))
        if not os.path.exists(Key):
            raise _ClientError("404")
        import datetime
        return {"LastModified": datetime.datetime.fromtimestamp(
            os.path.getmtime(Key), datetime.timezone.utc)}

    def delete_object(self, Bucket, Key):
        self.calls.append(("delete", Key))
        try:
            os.remove(Key)
        except FileNotFoundError:
            pass


def test_primitives_follow_s3_protocol():
    c = FakeS3Client()
    s3 = S3AtomicStorage(client=c)
    s3.put_atomic("s3://b/t/.hoodie/1.commit.completed.json", b"{}")
    assert c.objects[("b", "t/.hoodie/1.commit.completed.json")] == b"{}"
    # conditional create: first wins, second observes PreconditionFailed
    assert s3.put_if_absent("s3://b/t/.hoodie/.lock", b"") is True
    assert s3.put_if_absent("s3://b/t/.hoodie/.lock", b"") is False
    assert ("put", "t/.hoodie/.lock", "*") in c.calls
    # idempotent delete with advisory existed flag
    assert s3.delete_if_exists("s3://b/t/.hoodie/.lock") is True
    assert s3.delete_if_exists("s3://b/t/.hoodie/.lock") is False
    # default-bucket mode for non-URI paths
    s3b = S3AtomicStorage(bucket="warehouse", client=c)
    s3b.put_atomic("/tables/t/.hoodie/x.json", b"1")
    assert ("warehouse", "tables/t/.hoodie/x.json") in c.objects
    with pytest.raises(ValueError, match="no default bucket"):
        S3AtomicStorage(client=c).put_atomic("/plain/path", b"")


def test_conditional_request_conflict_is_lost_race():
    class Racy(FakeS3Client):
        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            if IfNoneMatch == "*":
                raise _ClientError("ConditionalRequestConflict")
            super().put_object(Bucket, Key, Body)

    s3 = S3AtomicStorage(client=Racy())
    assert s3.put_if_absent("s3://b/k", b"") is False  # retryable, no crash


def test_mtime_via_head_object():
    c = FakeS3Client()
    s3 = S3AtomicStorage(client=c)
    assert s3.mtime("s3://b/missing") is None
    s3.put_atomic("s3://b/k", b"x")
    import time
    assert abs(s3.mtime("s3://b/k") - time.time()) < 5


def test_unexpected_errors_propagate():
    class Flaky(FakeS3Client):
        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            raise _ClientError("SlowDown")

    s3 = S3AtomicStorage(client=Flaky())
    with pytest.raises(_ClientError):
        s3.put_if_absent("s3://b/k", b"")


@pytest.fixture()
def s3_storage():
    client = LocalBackedS3Client()
    orig = st.ATOMIC
    st.ATOMIC = S3AtomicStorage(client=client,
                                path_to_key=lambda p: ("local", p))
    yield client
    st.ATOMIC = orig


def test_full_lifecycle_through_s3_adapter(spark, orders, tmp_table_path,
                                           s3_storage):
    """create → bulk_insert → upsert → delete → snapshot/incremental →
    compact-era services, with every commit publish, lock acquire and lock
    release issued as S3 API calls."""
    tbl = HoodieTable.create(spark, tmp_table_path, "s3_t",
                             ["o_orderkey"], "o_orderdate")
    from pyspark.sql import functions as F

    tbl.bulk_insert(orders.limit(200))
    tbl.upsert(orders.limit(50).withColumn("o_orderstatus", F.lit("X")))
    tbl.delete(orders.limit(10).select("o_orderkey"))
    assert tbl.snapshot().count() == 190
    assert tbl.snapshot().filter("o_orderstatus = 'X'").count() == 40
    c1 = tbl.timeline.completed()[0].timestamp
    assert tbl.incremental(begin=c1).count() > 0
    # every completed-instant publish went through PutObject
    puts = [k for (op, k, *_) in s3_storage.calls if op == "put"]
    assert any(k.endswith(".completed.json") for k in puts)
    # two-writer lock race over the S3 protocol: acquire must be the
    # conditional write, release the delete
    a = tl.LockProvider(tmp_table_path, timeout_s=5)
    b = tl.LockProvider(tmp_table_path, timeout_s=0.3)
    with a:
        with pytest.raises(TimeoutError):
            b.__enter__()
    with b:
        pass
    lock_key = os.path.join(tmp_table_path, ".hoodie", ".lock")
    assert ("put", lock_key, "*") in s3_storage.calls
    assert ("delete", lock_key) in s3_storage.calls
