import os

from hoodie_spark.timeline import (COMMIT, COMPLETED, Instant, LockProvider,
                                   Timeline)


def test_instant_monotonic(tmp_table_path):
    tl = Timeline(tmp_table_path)
    tl.init()
    ts = [tl.new_instant_time() for _ in range(5)]
    assert ts == sorted(ts) and len(set(ts)) == 5


def test_atomic_complete_and_metadata(tmp_table_path):
    tl = Timeline(tmp_table_path)
    tl.init()
    t = tl.new_instant_time()
    tl.create_requested(COMMIT, t)
    tl.transition_inflight(COMMIT, t)
    assert tl.pending() and not tl.completed()
    tl.complete(COMMIT, t, {"write_stats": [{"x": 1}]})
    assert not tl.pending()
    assert [i.timestamp for i in tl.completed()] == [t]
    assert tl.metadata(Instant(t, COMMIT))["write_stats"] == [{"x": 1}]


def test_archive_roundtrip(tmp_table_path):
    tl = Timeline(tmp_table_path)
    tl.init()
    times = []
    for i in range(6):
        t = tl.new_instant_time()
        tl.create_requested(COMMIT, t)
        tl.complete(COMMIT, t, {"n": i})
        times.append(t)
    moved = tl.archive(max_active=2)
    assert moved == 4
    # archived instants still visible + readable (HoodieArchivedTimeline)
    assert [i.timestamp for i in tl.completed()] == times
    assert tl.metadata(Instant(times[0], COMMIT))["n"] == 0
    active = tl.instants((COMPLETED,), include_archived=False)
    assert [i.timestamp for i in active] == times[4:]


def test_lock_provider(tmp_table_path):
    os.makedirs(os.path.join(tmp_table_path, ".hoodie"))
    with LockProvider(tmp_table_path):
        import pytest

        with pytest.raises(TimeoutError):
            with LockProvider(tmp_table_path, timeout_s=0.2):
                pass
    with LockProvider(tmp_table_path, timeout_s=0.2):
        pass


def test_partition_expr_column_extraction():
    """String literals and function names must not read as column refs."""
    from hoodie_spark.keygen import _expr_columns

    assert _expr_columns("date_format(o_orderdate,'yyyy')") == {"o_orderdate"}
    assert _expr_columns("cast(year(o_orderdate) as string)") == {"o_orderdate"}
    assert _expr_columns("concat(region, '/', city)") == {"region", "city"}
    assert _expr_columns("'constant'") == set()


def test_archive_chunk_crash_between_publish_and_delete(tmp_table_path):
    """Crash AFTER the chunk publish but BEFORE the active deletes: the
    instant is visible in both places and readers must dedup — never
    duplicate, never lose."""
    tl = Timeline(tmp_table_path)
    tl.init()
    times = []
    for i in range(5):
        t = tl.new_instant_time()
        tl.create_requested(COMMIT, t)
        tl.complete(COMMIT, t, {"n": i})
        times.append(t)
    orig = tl.delete_instant
    tl.delete_instant = lambda inst: None  # crash: deletes never run
    try:
        assert tl.archive(max_active=2) == 3
    finally:
        tl.delete_instant = orig
    # in BOTH places now; completed() must dedup to the original set
    assert [i.timestamp for i in tl.completed()] == times
    assert tl.metadata(Instant(times[0], COMMIT))["n"] == 0
    # the retried archive re-folds the still-active instants into a new
    # chunk; the duplicate records collapse in every reader
    assert tl.archive(max_active=2) == 3
    assert [i.timestamp for i in tl.completed()] == times
    active = tl.instants((COMPLETED,), include_archived=False)
    assert [i.timestamp for i in active] == times[3:]
