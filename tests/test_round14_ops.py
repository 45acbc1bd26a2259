"""Round-14 new operators: dedup_keep_best (best-scoring winner per
near-dup cluster) and token_budget_select (greedy selection under a
token budget)."""

from pyspark.sql import functions as F

from hoodie_spark import functions as HF

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, n=200):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").filter(F.col("doc_id") < n))


# ---------------------------------------------------- dedup_keep_best
def test_keep_best_exact_cluster_keeps_highest_score(spark):
    rows = [(1, "identical content here", 10.0),
            (2, "identical content here", 30.0),
            (3, "identical content here", 30.0),   # score tie → min id
            (4, "a different document entirely", 5.0)]
    out = HF.dedup_keep_best(
        spark.createDataFrame(rows, "id long, text string, score double"),
        "id", "text", "score")
    got = {r["id"]: r["n_dups"] for r in out.collect()}
    assert got == {2: 3, 4: 1}


def test_keep_best_near_cluster_and_null_scores(spark):
    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(1, base * 4, None),          # NULL score sorts below all
            (2, base * 4 + "tail", 1.0),  # near-dup of 1, wins
            (3, "completely unrelated text about other things", None)]
    out = HF.dedup_keep_best(
        spark.createDataFrame(rows, "id long, text string, score double"),
        "id", "text", "score", threshold=0.5)
    got = {r["id"]: r["n_dups"] for r in out.collect()}
    assert got == {2: 2, 3: 1}
    # all-NULL cluster: min id wins, cluster never vanishes
    rows2 = [(7, "identical text body", None),
             (8, "identical text body", None)]
    out2 = HF.dedup_keep_best(
        spark.createDataFrame(rows2, "id long, text string, score double"),
        "id", "text", "score")
    assert {r["id"]: r["n_dups"] for r in out2.collect()} == {7: 2}


def test_keep_best_vs_seen_dedup_same_clusters(spark):
    """With score = -id the best member IS the smallest id, so the
    winner set must equal arrival-order dedup over the same relation
    (exact edges; sub-shingle docs have no near edges)."""
    # texts under 5 chars carry no shingle signature → exact edges only
    rows = [(i, f"d{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, text string") \
        .withColumn("score", -F.col("id").cast("double"))
    out = HF.dedup_keep_best(df, "id", "text", "score")
    assert sorted(r["id"] for r in out.collect()) == list(range(7))
    assert {r["n_dups"] for r in out.collect()} == {6, 5}  # 40 = 7*5+5


def test_keep_best_no_window_in_plan(spark):
    docs = _docs(spark).withColumn("score",
                                   F.length("text").cast("double"))
    out = HF.dedup_keep_best(docs, "doc_id", "text", "score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # winners ⊆ input, n_dups ≥ 1, total cluster mass = corpus size
    agg = out.agg(F.sum("n_dups").alias("m"),
                  F.min("n_dups").alias("lo")).collect()[0]
    assert agg["m"] == docs.count() and agg["lo"] >= 1


def test_keep_best_partitioning_invariant(spark):
    docs = _docs(spark).withColumn("score",
                                   F.length("text").cast("double"))
    a = HF.dedup_keep_best(docs.repartition(1), "doc_id", "text", "score")
    b = HF.dedup_keep_best(docs.repartition(13, "doc_id"),
                           "doc_id", "text", "score")
    assert sorted(map(tuple, a.select("doc_id", "n_dups").collect())) == \
        sorted(map(tuple, b.select("doc_id", "n_dups").collect()))


# ------------------------------------------------ token_budget_select
def test_token_budget_prefix_semantics(spark):
    rows = [(1, 10, 100), (2, 20, 200), (3, 30, 300), (4, 40, 400)]
    df = spark.createDataFrame(rows, "id long, rank int, w long")
    out = HF.token_budget_select(df, "w", 650, ["rank", "id"])
    got = {r["id"]: r["cum_tokens"] for r in out.collect()}
    # 100, 300, 600 fit; 1000 > 650 cut
    assert got == {1: 100, 2: 300, 3: 600}
    # exact-budget boundary row is KEPT (≤, not <)
    out2 = HF.token_budget_select(df, "w", 600, ["rank", "id"])
    assert {r["id"] for r in out2.collect()} == {1, 2, 3}


def test_token_budget_null_and_zero_weights(spark):
    rows = [(1, 1, None), (2, 2, 0), (3, 3, 5), (4, 4, 10)]
    df = spark.createDataFrame(rows, "id long, rank int, w int")
    out = HF.token_budget_select(df, "w", 5, ["rank", "id"])
    # NULL/zero-weight rows cost nothing and are kept inside the prefix
    assert {r["id"]: r["cum_tokens"] for r in out.collect()} == \
        {1: 0, 2: 0, 3: 5}


def test_token_budget_empty_and_overbudget(spark):
    df = spark.createDataFrame([], "id long, rank int, w int")
    assert HF.token_budget_select(df, "w", 10, ["rank", "id"]).count() == 0
    one = spark.createDataFrame([(1, 1, 99)], "id long, rank int, w int")
    assert HF.token_budget_select(one, "w", 10,
                                  ["rank", "id"]).count() == 0


def test_token_budget_matches_single_bucket_and_repartition(spark):
    docs = (_docs(spark, n=500)
            .withColumn("n_tokens", HF.token_count(F.col("text"))
                        .cast("long"))
            .withColumn("n_chars", F.length("text")))
    kw = dict(weight_col="n_tokens", budget=8000,
              order_cols=["n_chars", "doc_id"])
    a = sorted(map(tuple, HF.token_budget_select(docs, **kw)
                   .select("doc_id", "cum_tokens").collect()))
    b = sorted(map(tuple, HF.token_budget_select(
        docs.repartition(17), num_buckets=1, **kw)
        .select("doc_id", "cum_tokens").collect()))
    assert a == b and len(a) > 0
    # no single-task global sort: every Exchange is keyed, the prefix
    # sum runs per order-contiguous bucket
    plan = HF.token_budget_select(docs, **kw) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


# -------------------------------------------- excess_perplexity_select
def test_excess_ppl_select_zero_when_ref_is_corpus(spark):
    docs = _docs(spark, n=80)
    out = HF.excess_perplexity_select(docs, "doc_id", "text", docs, k=80)
    rows = out.collect()
    assert len(rows) == 80
    for r in rows:
        assert r["excess"] == 0.0 and r["nll_self"] == r["nll_ref"]


def test_excess_ppl_select_prefers_reference_style(spark):
    """Docs written in the reference's style but rare in the corpus are
    exactly what excess loss surfaces: hard under the corpus self-LM,
    easy under the reference LM."""
    a = [(i, "the common corpus style sentence repeats the same words "
             "over and over in the corpus")
         for i in range(50)]
    b = [(100, "zephyr quills jolt vexed gnome wizards bright"),
         (101, "zephyr quills jolt vexed gnome wizards bright")]
    corpus = spark.createDataFrame(a + b, "doc_id long, text string")
    ref = spark.createDataFrame(
        [(0, "zephyr quills jolt vexed gnome wizards bright")] * 3,
        "doc_id long, text string")
    top = HF.excess_perplexity_select(corpus, "doc_id", "text", ref, k=2)
    assert sorted(r["doc_id"] for r in top.collect()) == [100, 101]


def test_excess_ppl_select_deterministic_and_layout_invariant(spark):
    docs = _docs(spark, n=200)
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    a = [(r["doc_id"], r["excess"]) for r in
         HF.excess_perplexity_select(docs, "doc_id", "text", ref, k=30)
         .collect()]
    b = [(r["doc_id"], r["excess"]) for r in
         HF.excess_perplexity_select(docs.repartition(13), "doc_id",
                                     "text", ref.repartition(3), k=30)
         .collect()]
    assert a == b and len(a) == 30
    # excess is exactly the round-6 difference of the returned NLLs
    full = HF.excess_perplexity_select(docs, "doc_id", "text", ref, k=30)
    for r in full.collect():
        assert r["excess"] == round(r["nll_self"] - r["nll_ref"], 6)
