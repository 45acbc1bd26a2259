"""Fixed-size deterministic sampling: priority_sample (batch) and
ReservoirMaintainer (maintained bottom-k ≡ batch over the union)."""

import os

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark import functions as HF
from hoodie_spark.streaming import ReservoirMaintainer

SF_DIR = "/root/testdata/sf0.001"


def _table(spark, path):
    return HoodieTable.create(spark, path, "docs_resv", ["doc_id"], None)


def _docs(spark, n=150):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id").filter(F.col("doc_id") < n))


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


# ------------------------------------------------------ priority_sample
def test_priority_sample_deterministic_and_layout_invariant(spark):
    docs = _docs(spark)
    a = _ids(HF.priority_sample(docs, "doc_id", 40))
    b = _ids(HF.priority_sample(docs.repartition(13), "doc_id", 40))
    assert a == b and len(a) == 40
    # a different salt draws a different sample of the same size
    c = _ids(HF.priority_sample(docs, "doc_id", 40, salt="v2"))
    assert len(c) == 40 and c != a


def test_priority_sample_is_bottom_k_of_hash(spark):
    docs = _docs(spark, n=60)
    got = _ids(HF.priority_sample(docs, "doc_id", 10))
    import hashlib

    want = sorted(sorted(range(60),
                         key=lambda i: (hashlib.md5(str(i).encode())
                                        .hexdigest(), i))[:10])
    assert got == want


def test_priority_sample_monoid_property(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the
    property that makes the maintained reservoir exact."""
    docs = _docs(spark, n=120)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = _ids(HF.priority_sample(docs, "doc_id", 25))
    parts = _ids(HF.priority_sample(
        HF.priority_sample(a, "doc_id", 25)
        .unionByName(HF.priority_sample(b, "doc_id", 25)),
        "doc_id", 25))
    assert whole == parts


def test_priority_sample_edges(spark):
    docs = _docs(spark, n=20)
    assert HF.priority_sample(docs, "doc_id", 0).count() == 0
    assert HF.priority_sample(docs, "doc_id", 999).count() == 20
    with pytest.raises(ValueError):
        HF.priority_sample(docs, "doc_id", -1)


# ------------------------------------------- weighted_priority_sample
def test_weighted_sample_matches_python(spark):
    """Selected set == python replay of e = -ln(u)/w with u from the
    first 15 md5 hex chars — the engine-portable E-S exponential race."""
    import hashlib
    import math

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = _ids(HF.weighted_priority_sample(df, "doc_id", "w", 15))

    def e(i, w):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return -math.log((v + 1) / float(16 ** 15 + 1)) / w

    want = sorted(sorted(rows, key=lambda r: (e(*r), r[0]))[:15])
    assert got == [i for i, _ in want]


def test_weighted_sample_bias_and_guards(spark):
    # 50 heavy rows (w=1000) vs 450 light (w=1): heavy rows dominate
    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = _ids(HF.weighted_priority_sample(df, "doc_id", "w", 40))
    assert sum(1 for i in got if i < 50) >= 30
    # NULL / zero / negative weights can never be drawn
    bad = spark.createDataFrame(
        [(1000, None), (1001, 0.0), (1002, -3.0)], "doc_id long, w double")
    all_rows = df.unionByName(bad)
    assert not any(i >= 1000 for i in _ids(
        HF.weighted_priority_sample(all_rows, "doc_id", "w", 500)))
    with pytest.raises(ValueError):
        HF.weighted_priority_sample(df, "doc_id", "w", -1)


def test_weighted_sample_layout_invariant_and_monoid(spark):
    rows = [(i, float(1 + i % 9)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = _ids(HF.weighted_priority_sample(df, "doc_id", "w", 30))
    b = _ids(HF.weighted_priority_sample(df.repartition(17), "doc_id",
                                         "w", 30))
    assert a == b and len(a) == 30
    evens = df.filter(F.col("doc_id") % 2 == 0)
    odds = df.filter(F.col("doc_id") % 2 == 1)
    parts = _ids(HF.weighted_priority_sample(
        HF.weighted_priority_sample(evens, "doc_id", "w", 30)
        .unionByName(HF.weighted_priority_sample(odds, "doc_id", "w", 30)),
        "doc_id", "w", 30))
    assert parts == a


# --------------------------------------------------- ReservoirMaintainer
def test_reservoir_equals_batch_over_union(spark, tmp_table_path):
    docs = _docs(spark)
    tbl = _table(spark, tmp_table_path)
    m = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=60)
    batches = [docs.withColumn("doc_id", F.col("doc_id") + i * 10000)
               for i in range(3)]
    for b in batches:
        tbl.insert(b)
        m.catch_up()
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = _ids(HF.priority_sample(union, "doc_id", 60))
    assert _ids(m.reservoir()) == want
    # idle catch_up is a no-op
    m.catch_up()
    assert _ids(m.reservoir()) == want


def test_reservoir_replay_idempotent_and_restart(spark, tmp_table_path):
    docs = _docs(spark)
    tbl = _table(spark, tmp_table_path)
    m = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=30)
    m.fold(docs)
    before = _ids(m.reservoir())
    m.fold(docs)  # crash replay of the same batch
    assert _ids(m.reservoir()) == before
    # restart picks up the persisted state (and its captured key type)
    m2 = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                             "doc_id", k=30)
    assert _ids(m2.reservoir()) == before


def test_reservoir_param_guards(spark, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    m = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=10)
    m.fold(_docs(spark, n=40))
    with pytest.raises(ValueError, match="k="):
        ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=20)
    with pytest.raises(ValueError, match="salt="):
        ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=10, salt="other")
    with pytest.raises(ValueError, match="keys"):
        m.fold(_docs(spark, n=10).select(
            F.col("doc_id").cast("string").alias("doc_id")))


def test_reservoir_rollback_rebuilds(spark, tmp_table_path):
    docs = _docs(spark)
    tbl = _table(spark, tmp_table_path)
    m = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "_r"),
                            "doc_id", k=40)
    tbl.insert(docs)
    m.catch_up()
    extra = docs.withColumn("doc_id", F.col("doc_id") + 10000)
    r2 = tbl.insert(extra)
    m.catch_up()
    tbl.rollback(r2.instant)
    m.catch_up()  # detects the rollback past the watermark → rebuild
    want = _ids(HF.priority_sample(docs, "doc_id", 40))
    assert _ids(m.reservoir()) == want, \
        "rolled-back keys must leave the sample (bottom-k cannot un-see)"


def test_reservoir_no_single_partition_exchange(spark, tmp_table_path):
    docs = _docs(spark)
    plan = HF.priority_sample(docs, "doc_id", 10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


# ------------------------------------------ weighted ReservoirMaintainer
def test_weighted_reservoir_equals_batch_over_union(spark, tmp_table_path):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "n_chars").filter(F.col("doc_id") < 150))
    tbl = HoodieTable.create(spark, os.path.join(tmp_table_path, "t"),
                             "docs_wres", ["doc_id"], None)
    m = ReservoirMaintainer(tbl, os.path.join(tmp_table_path, "res"),
                            "doc_id", k=40, weight_col="n_chars")
    batches = [docs.withColumn("doc_id", F.col("doc_id") + k * 10000)
               for k in range(3)]
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    for b in batches:
        tbl.insert(b)
        m.catch_up()
    got = sorted((r["doc_id"], r["__pr"])
                 for r in m.reservoir().collect())
    want_df = HF.weighted_priority_sample(union, "doc_id", "n_chars", 40)
    from hoodie_spark.functions.pipeline import weighted_priority
    want = sorted((r["doc_id"], r["e"]) for r in want_df.select(
        "doc_id", weighted_priority("doc_id", "n_chars").alias("e"))
        .collect())
    assert got == want
    # replayed catch_up with no new commits: unchanged
    m.catch_up()
    assert sorted((r["doc_id"], r["__pr"])
                  for r in m.reservoir().collect()) == got


def test_weighted_reservoir_param_guard(spark, tmp_table_path):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "n_chars").filter(F.col("doc_id") < 30))
    tbl = HoodieTable.create(spark, os.path.join(tmp_table_path, "t"),
                             "docs_wres", ["doc_id"], None)
    state = os.path.join(tmp_table_path, "res")
    m = ReservoirMaintainer(tbl, state, "doc_id", k=10,
                            weight_col="n_chars")
    m.fold(docs)
    with pytest.raises(ValueError):
        ReservoirMaintainer(tbl, state, "doc_id", k=10)  # uniform rival
    with pytest.raises(ValueError):
        ReservoirMaintainer(tbl, state, "doc_id", k=10, weight_col="other")
