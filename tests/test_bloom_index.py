"""Bloom sketch pruning: candidate files shrink even with UUID-style keys.

Reference behavior: SparkHoodieBloomIndex.java:256-266 prunes candidate
files by range AND bloom membership. Range pruning alone is useless for
random keys (every file's [min,max] spans the space) — these tests prove
the sketch path prunes where ranges can't, and never changes results.
"""

import os

from pyspark.sql import functions as F

from hoodie_spark import HoodieTable, WriteConfig
from hoodie_spark import bloom
from hoodie_spark import storage as st
from hoodie_spark.config import IndexType, PARTITION_PATH, RECORD_KEY
from hoodie_spark.index import _prune_by_key_range
from hoodie_spark.keygen import with_keys

SF_DIR = "/root/testdata/sf0.001"


def _uuid_orders(spark):
    """Orders with a random-looking (md5) string key — worst case for
    range pruning."""
    return (spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .withColumn("ukey", F.md5(F.col("o_orderkey").cast("string"))))


def _make_table(spark, path, sort_mode=None):
    from hoodie_spark.writer import SortMode

    tbl = HoodieTable.create(
        spark, path, "bloomy", ["ukey"], "o_orderdate",
        write_config=WriteConfig(index_type=IndexType.BLOOM,
                                 bloom_sketch_min_records=1,
                                 bloom_harvest_on_write=True,
                                 parquet_max_file_size=128 * 1024,
                                 parquet_small_file_limit=64 * 1024))
    tbl.bulk_insert(_uuid_orders(spark), sort_mode=sort_mode or SortMode.NONE)
    return tbl


def test_bloom_prunes_where_ranges_cannot(spark, tmp_table_path):
    tbl = _make_table(spark, tmp_table_path)
    view = tbl.view()
    all_slices = [sl for sl in view.latest_slices() if sl.base_file]
    assert len(all_slices) >= 5, "need multiple files for pruning to matter"
    # sidecar sketches were harvested for the bulk_insert commit
    assert any(f.endswith(".json") for f in
               os.listdir(os.path.join(tmp_table_path, ".hoodie", "bloom")))

    # a handful of keys (far fewer than files) so most files hold none
    batch = _uuid_orders(spark).filter(F.col("o_orderkey") % 401 == 1)
    prepared = with_keys(batch, tbl.config).select(RECORD_KEY, PARTITION_PATH)
    ranged = _prune_by_key_range(prepared, all_slices, is_global=False)
    assert len(ranged) == len(all_slices), \
        "random keys must defeat range pruning (else this test is vacuous)"
    surviving = bloom.prune(spark, prepared, ranged, False, tbl)
    # <=1 file per incoming key can genuinely match; false positives keep a
    # file but at fp ~6e-5 spurious survivals are ~0
    assert len(surviving) <= batch.count()
    # never prune a file that actually holds an incoming key (no false
    # negatives): re-tag through the full upsert and verify correctness
    tbl.upsert(batch.withColumn("o_orderstatus", F.lit("BL")))
    snap = tbl.snapshot()
    n = _uuid_orders(spark).count()
    assert snap.count() == n
    assert snap.select("ukey").distinct().count() == n
    assert snap.filter("o_orderstatus = 'BL'").count() == batch.count()


def test_bloom_upsert_matches_simple_index(spark, tmp_table_path):
    a = _make_table(spark, os.path.join(tmp_table_path, "bloom"))
    b = HoodieTable.create(
        spark, os.path.join(tmp_table_path, "simple"), "plain", ["ukey"],
        "o_orderdate",
        write_config=WriteConfig(index_type=IndexType.SIMPLE,
                                 bloom_sketch_min_records=1,
                                 parquet_max_file_size=128 * 1024,
                                 parquet_small_file_limit=64 * 1024))
    b.bulk_insert(_uuid_orders(spark))
    for tbl in (a, b):
        tbl.upsert(_uuid_orders(spark).filter(F.col("o_orderkey") % 11 == 3)
                   .withColumn("o_totalprice", F.col("o_totalprice") + 9.0))
        tbl.delete(_uuid_orders(spark).filter(F.col("o_orderkey") % 13 == 2)
                   .select("ukey", "o_orderdate"))
    cols = ["ukey", "o_orderstatus", "o_totalprice"]
    ra = sorted(tuple(r) for r in a.snapshot().select(*cols).collect())
    rb = sorted(tuple(r) for r in b.snapshot().select(*cols).collect())
    assert ra == rb


def test_probe_batches_bound_broadcast(spark, tmp_table_path, monkeypatch):
    """With 1k+ sketched candidate files the probe must run in bounded
    batches (no single GB-scale broadcast) and still prune exactly —
    surviving files are precisely the ones holding a probed key."""
    import json

    from hoodie_spark.fsview import BaseFile, FileSlice

    n_files, m = 1200, 1 << 10
    files = [(f"f{i:04d}-0_0-0-0_c1.parquet", f"key-{i:04d}")
             for i in range(n_files)]
    # honest sketches: the same xxhash64 derivation prune uses, one key each
    rows = spark.createDataFrame(files, "fn string, k string") \
        .select("fn", *[p.alias(f"p{s}") for s, p in enumerate(
            bloom._positions(F.col("k"), F.lit(m), bloom.K_HASHES))]).collect()
    side = {}
    for r in rows:
        chars = ["0"] * (m // 4)
        for s in range(bloom.K_HASHES):
            pos = r[f"p{s}"]
            chars[pos // 4] = format(
                int(chars[pos // 4], 16) | (1 << (pos % 4)), "x")
        side[r["fn"]] = {"m": m, "k": bloom.K_HASHES, "hex": "".join(chars)}

    class FakeTable:
        base_path = tmp_table_path
        write_config = WriteConfig(bloom_sketch_min_records=1)
        storage = st.LOCAL  # sidecar reads go through the Storage seam
    os.makedirs(os.path.join(tmp_table_path, ".hoodie", "bloom"))
    with open(os.path.join(tmp_table_path, ".hoodie", "bloom", "c1.json"),
              "w") as f:
        json.dump(side, f)

    slices = [FileSlice("p", fn.split("_")[0], "c1",
                        BaseFile(fn, fn, num_records=1))
              for fn, _k in files]
    probed = {"key-0007", "key-0420", "key-1111"}
    keys = spark.createDataFrame(
        [(k, "p") for k in probed], f"{RECORD_KEY} string, {PARTITION_PATH} string")

    calls = []
    real_probe = bloom._probe
    monkeypatch.setattr(bloom, "_probe", lambda sp, kdf, batch, g:
                        calls.append(len(batch)) or real_probe(sp, kdf, batch, g))
    surviving = bloom.prune(spark, keys, slices, False, FakeTable())
    assert len(calls) >= n_files // bloom.PROBE_BATCH_FILES
    assert all(c <= bloom.PROBE_BATCH_FILES for c in calls)
    assert {sl.file_id for sl in surviving} == \
        {f"f{k.split('-')[1]}-0" for k in probed}


def test_lazy_harvest_at_first_tag(spark, tmp_table_path):
    """Default harvest mode: writes pay NO sketch job; the first upsert tag
    sketches the candidate files once (sidecar appears for the bulk-insert
    instant), and later tags reuse them — results identical throughout."""
    from hoodie_spark.writer import SortMode

    tbl = HoodieTable.create(
        spark, tmp_table_path, "lazy_bloom", ["ukey"], "o_orderdate",
        write_config=WriteConfig(index_type=IndexType.BLOOM,
                                 bloom_sketch_min_records=1,
                                 parquet_max_file_size=128 * 1024,
                                 parquet_small_file_limit=64 * 1024))
    tbl.bulk_insert(_uuid_orders(spark), sort_mode=SortMode.NONE)
    bloom_dir = os.path.join(tmp_table_path, ".hoodie", "bloom")
    assert not os.path.isdir(bloom_dir) or not os.listdir(bloom_dir), \
        "lazy mode must not sketch at write time"

    batch = _uuid_orders(spark).filter(F.col("o_orderkey") % 401 == 1)
    tbl.upsert(batch.withColumn("o_orderstatus", F.lit("LZ")))
    sidecars = os.listdir(bloom_dir)
    assert sidecars, "first tag must harvest sketches for candidate files"

    # second tag reuses them (no new sidecar content is required)
    import json as _json
    before = {s: _json.load(open(os.path.join(bloom_dir, s))) for s in sidecars}
    tbl.upsert(batch.withColumn("o_orderstatus", F.lit("L2")))
    n = _uuid_orders(spark).count()
    snap = tbl.snapshot()
    assert snap.count() == n
    assert snap.filter("o_orderstatus = 'L2'").count() == batch.count()
    for s, content in before.items():
        assert _json.load(open(os.path.join(bloom_dir, s))) == content
