"""Round-14 verdict tasks: exact-duplicate edge de-skew (the last
hot-hash windows), SplitMaintainer bridge observability + state
compaction + id-type agnosticism + hot-group knob + persist contract,
and the BigramLM release path."""

import os

import pytest
from pyspark.sql import functions as F

from hoodie_spark import HoodieTable
from hoodie_spark import functions as HF
from hoodie_spark.streaming import SplitMaintainer

SF_DIR = "/root/testdata/sf0.001"
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _table(spark, path, key_type_expr=None):
    return HoodieTable.create(spark, path, "docs_split", ["doc_id"],
                              "doc_id", partition_expr="'p'")


def _docs(spark, n=60):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < n))


# ------------------------------------------------- exact-edge de-skew
def test_leakage_split_hot_exact_dup_no_window(spark):
    """≥100k byte-identical docs — the exact population the split's
    exact-text edges exist for (boilerplate clusters). The docs are too
    short to carry a shingle signature, so the ONLY duplicate relation
    is the exact-edge path: it must be a groupBy(hash) min + join back,
    never a window that sorts the whole cluster in one task."""
    n = 100_000
    # 3 chars < the 5-char shingle width → no MinHash signature, no LSH
    # bands: the exact-edge path is isolated (and the probe doesn't pay
    # the separately-guarded hot-band self-join on 100k identical sigs)
    dup = spark.range(0, n).select(
        F.col("id").alias("doc_id"), F.lit("abc").alias("text"))
    clean = spark.range(n, n + 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique "), F.col("id").cast("string")).alias("text"))
    out = HF.leakage_safe_split(dup.unionByName(clean), "doc_id", "text",
                                SPLITS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, \
        "exact-duplicate edges regressed to a window over the text hash"
    agg = (out.filter(F.col("doc_id") < n)
           .agg(F.count_distinct("split").alias("k"),
                F.count(F.lit(1)).alias("n")).collect()[0])
    assert agg["n"] == n
    assert agg["k"] == 1, "byte-identical cluster split across splits"


def test_exact_dedup_no_window_and_min_id_kept(spark):
    df = spark.createDataFrame(
        [(5, "same"), (2, "same"), (9, "same"), (7, "other")],
        "id long, text string")
    out = HF.exact_dedup(df, ["text"], "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert sorted(r["id"] for r in out.collect()) == [2, 7]


def test_seen_dedup_exact_pass_no_window(spark):
    docs = _docs(spark, n=200)
    out = HF.seen_dedup(docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 10_000)),
        "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # every +10k copy has an exact duplicate earlier (its original) —
    # all drop; the originals' keep-set is the single-corpus one (the sf
    # docs carry duplicates among THEMSELVES, so compare, don't count)
    assert out.filter(F.col("doc_id") >= 10_000).count() == 0
    want = {r["doc_id"] for r in
            HF.seen_dedup(docs, "doc_id", "text").select("doc_id").collect()}
    got = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert got == want


def test_split_maintainer_assign_no_window(spark, tmp_table_path):
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS)
    out = sm._assign(_docs(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, \
        "maintained split's in-batch exact edges regressed to a window"


# --------------------------------------------------- bridge counter
def test_bridge_counter_increments_and_rebuild_resets(
        spark, tmp_table_path):
    """A doc whose matches span two already-assigned components is the
    documented online limitation — the counter makes it OBSERVABLE so an
    operator can decide when rebuild() is warranted."""
    # construction searched offline against the EXACT md5 MinHash plane
    # (deterministic forever): C = A+" "+B shares one full LSH band and
    # ≥4/16 signature positions with EACH of A and B, while A and B share
    # zero positions and zero bands — so at threshold 0.25 (mm=4) doc 3
    # bridges the two already-assigned components
    a = "nu tau delta pi lam eta alpha rho " * 3
    b = "two four eight three fifteen six one eleven " * 3
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS, threshold=0.25)
    sm.assign_and_register(spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"))
    assert sm.bridge_count() == 0
    out = sm.assign_and_register(spark.createDataFrame(
        [(3, a + " " + b)], "doc_id long, text string"))
    r3 = out.select("__root").collect()[0]["__root"]
    assert r3 == 1, "bridge doc must inherit the smallest matched root"
    assert sm.bridge_count() == 1, "bridge fold did not count"
    # counter survives a maintainer restart (persisted in state.json)
    sm2 = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                          "doc_id", "text", SPLITS, threshold=0.25)
    assert sm2.bridge_count() == 1
    # rebuild re-derives batch-exact assignments → drift counter resets
    tbl.insert(spark.createDataFrame(
        [(1, a), (2, b), (3, a + " " + b)], "doc_id long, text string"))
    sm.rebuild()
    assert sm.bridge_count() == 0


def test_non_bridge_folds_do_not_count(spark, tmp_table_path):
    docs = _docs(spark, n=100)
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS)
    sm.assign_and_register(docs)
    # exact copies match exactly ONE state root each — never a bridge
    sm.assign_and_register(docs.withColumn("doc_id",
                                           F.col("doc_id") + 10_000))
    assert sm.bridge_count() == 0


# --------------------------------------------------- state compaction
def test_compact_state_folds_replays_and_preserves_assignments(
        spark, tmp_table_path):
    docs = _docs(spark, n=120)
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS)
    sm.assign_and_register(docs)
    sm.assign_and_register(docs)  # crash replay: byte-identical appends
    sm.assign_and_register(docs.withColumn("doc_id",
                                           F.col("doc_id") + 10_000))
    before = {r["doc_id"]: (r["root"], r["split"])
              for r in sm.assignments().collect()}
    raw = spark.read.parquet(
        os.path.join(tmp_table_path, "_split", "assignments",
                     "gen-000000")).count()
    assert raw > len(before), "replay should have appended duplicates"
    sm.compact_state()
    after = {r["doc_id"]: (r["root"], r["split"])
             for r in sm.assignments().collect()}
    assert after == before
    compacted = spark.read.parquet(
        sm._sub_path("assignments")).count()
    assert compacted == len(before), "compaction left duplicate rows"
    # inheritance still works against the compacted generations
    out = sm.assign_and_register(
        docs.withColumn("doc_id", F.col("doc_id") + 20_000))
    for r in out.select("doc_id", "split").collect():
        assert r["split"] == before[r["doc_id"] - 20_000][1], \
            "post-compact copy escaped its original's split"
    # a restarted maintainer reads the compacted pointer
    sm2 = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                          "doc_id", "text", SPLITS)
    assert sm2._gens["content"] == sm._gens["content"]
    assert sm2.assignments().count() == len(before) + docs.count()


# ------------------------------------------------ id-type agnosticism
def test_string_ids_supported_and_type_mismatch_rejected(
        spark, tmp_table_path):
    docs = _docs(spark, n=80).select(
        F.concat(F.lit("doc-"), F.format_string("%05d", "doc_id"))
        .alias("doc_id"), "text")
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS)
    out = sm.assign_and_register(docs)
    assert out.count() == 80
    # id-ordered arrival (the documented contract): copy ids must sort
    # AFTER their originals, or the copy's own id would become the new
    # component root and re-hash the split — suffix, not prefix
    copies = docs.withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("-copy")))
    got = {r["doc_id"]: r["split"]
           for r in sm.assign_and_register(copies)
           .select("doc_id", "split").collect()}
    first = {r["doc_id"]: r["split"] for r in sm.assignments()
             .filter(~F.col("doc_id").endswith("-copy")).collect()}
    for k, split in got.items():
        assert split == first[k.removesuffix("-copy")]
    # a long-id batch against string-id state fails loudly, not silently
    with pytest.raises(ValueError, match="ids"):
        sm.assign_and_register(spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"))
    # the captured type survives restart via state.json
    sm2 = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                          "doc_id", "text", SPLITS)
    assert sm2._resolve_id_type() == "string"


# ------------------------------------------------- hot-group knob
def test_max_band_rows_knob_keeps_components_connected(
        spark, tmp_table_path):
    """Capped band groups stay connected through bounded_self_pairs'
    pivot rows, so the ASSIGNMENT is identical to the exact join."""
    docs = _docs(spark, n=150)
    tbl = _table(spark, tmp_table_path)
    exact = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_a"),
                            "doc_id", "text", SPLITS)
    capped = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_b"),
                             "doc_id", "text", SPLITS, max_band_rows=4)
    a = {r["doc_id"]: r["split"] for r in
         exact.assign_and_register(docs).select("doc_id",
                                                "split").collect()}
    b = {r["doc_id"]: r["split"] for r in
         capped.assign_and_register(docs).select("doc_id",
                                                 "split").collect()}
    assert a == b


# ------------------------------------------------- persist contract
def test_assign_and_register_returns_pinned_frame(spark, tmp_table_path):
    docs = _docs(spark, n=40)
    tbl = _table(spark, tmp_table_path)
    sm = SplitMaintainer(tbl, os.path.join(tmp_table_path, "_split"),
                         "doc_id", "text", SPLITS)
    out = sm.assign_and_register(docs)
    assert sm._pin is not None and sm._pin.is_cached, \
        "returned frame's parent must stay persisted for the caller"
    assert out.count() == 40  # cheap re-read off the pin
    sm.release()
    assert sm._pin is None
    # next fold releases the previous pin automatically
    out2 = sm.assign_and_register(
        docs.withColumn("doc_id", F.col("doc_id") + 1000))
    pin2 = sm._pin
    sm.assign_and_register(
        docs.withColumn("doc_id", F.col("doc_id") + 2000))
    assert not pin2.is_cached
    assert out2 is not None
    sm.release()


# ------------------------------------------------- BigramLM release
def test_bigram_lm_unpersist_releases_distributed_model(spark):
    docs = _docs(spark, n=60)
    lm = HF.train_bigram_lm(docs, "text", vocab_size=32,
                            broadcast_model_rows=0)  # force distributed
    assert not lm.broadcast
    # r16: the persisted frame is the shared (w1, w2, cb, cw) census both
    # model tables project from — that is what holds executor storage
    assert lm._census is not None and lm._census.is_cached
    lm.unpersist()
    assert not lm._census.is_cached
    # broadcast model: no-op, nothing persisted
    small = HF.train_bigram_lm(docs, "text", vocab_size=32)
    assert small.broadcast
    small.unpersist()
