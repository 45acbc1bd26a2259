"""Round-15 optimization guards: the performance rewrites must keep
results bit-identical and the plan shapes they bought must not silently
revert.

Covers: the distinct-before-hash sketch shape (and the repartition
barrier that keeps Catalyst's RemoveRedundantAggregates from undoing
the distinct), the duplicated-hashes-only exact-pair build side, the
one-pass dual-model scoring in excess_perplexity_select, and the
checkpointed star-fold in duplicate_groups."""

from pyspark.sql import functions as F

from hoodie_spark import functions as HF
from hoodie_spark.functions.components import duplicate_groups
from hoodie_spark.functions.dedup import exact_text_pairs


# ------------------------------------------------ distinct-before-hash
def test_sketch_distinct_survives_in_plan(spark):
    """The pre-hash distinct is duplicate-agnostic-min bait for
    RemoveRedundantAggregates; the repartition barrier must keep it.
    Without it the 64-way md5 partial agg runs over every occurrence
    again (measured 7.3 s vs 0.2 s at sf0.1)."""
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "y")], "g string, v string")
    sk = HF.group_distinct_sketch(df, "g", "v", num_hashes=4)
    opt = sk._jdf.queryExecution().optimizedPlan().toString()
    # two logical Aggregates: the distinct and the per-group mins
    assert opt.count("Aggregate [") >= 2, opt
    assert "RoundRobinPartitioning" in \
        sk._jdf.queryExecution().executedPlan().toString()


def test_sketch_duplication_invariant(spark):
    """min over a multiset == min over its support: the estimate must be
    bit-identical however many times each (group, value) repeats."""
    rows = [("s1", f"tok{i % 5}") for i in range(50)] + \
           [("s2", f"tok{i}") for i in range(7)]
    df = spark.createDataFrame(rows, "g string, v string")
    once = sorted(map(tuple, HF.group_distinct_sketch(
        df.distinct(), "g", "v", num_hashes=8).collect()))
    many = sorted(map(tuple, HF.group_distinct_sketch(
        df.unionAll(df), "g", "v", num_hashes=8).collect()))
    assert once == many


def test_group_sketches_duplication_invariant(spark):
    df = spark.createDataFrame(
        [("s1", "the quick brown fox jumps"),
         ("s2", "the quick brown fox jumps"),
         ("s2", "a different body of text")], "g string, t string")
    a = sorted(map(tuple, HF.group_sketches(
        df, "g", "t", num_hashes=4).collect()))
    b = sorted(map(tuple, HF.group_sketches(
        df.unionAll(df), "g", "t", num_hashes=4).collect()))
    assert a == b


# ------------------------------------- duplicated-hashes-only build side
def test_exact_text_pairs_singletons_emit_nothing(spark):
    rows = [(1, "dup body"), (2, "dup body"), (3, "dup body"),
            (4, "unique one"), (5, "unique two"), (6, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = sorted(map(tuple,
                     exact_text_pairs(df, "id", "text").collect()))
    assert got == [(1, 2), (1, 3)]


def test_seen_dedup_with_singletons_and_nulls(spark):
    rows = [(1, "same"), (2, "same"), (3, "only"), (4, None), (5, None)]
    df = spark.createDataFrame(rows, "id long, text string")
    kept = sorted(r["id"] for r in
                  HF.seen_dedup(df, "id", "text").collect())
    # NULL texts are never duplicates; singleton survives; later copy drops
    assert kept == [1, 3, 4, 5]


# --------------------------------------- one-pass dual-model LM scoring
def test_excess_select_one_pass_equals_two_pass(spark):
    from hoodie_spark.functions.lm import (bigram_perplexity,
                                           train_bigram_lm)

    rows = [(i, f"alpha beta gamma delta tok{i % 3} beta alpha end")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = df.filter(F.col("doc_id") % 5 == 0)
    got = HF.excess_perplexity_select(df, "doc_id", "text", ref, k=10,
                                      vocab_size=8)
    # replay the pre-r15 two-pass shape verbatim
    ref_lm = train_bigram_lm(ref, "text", vocab_size=8)
    self_lm = train_bigram_lm(df, "text", vocab_size=8)
    s = (bigram_perplexity(df, "doc_id", "text", lm=self_lm)
         .select("doc_id", "n_bigrams",
                 F.col("logprob").alias("__lp_self")))
    r = (bigram_perplexity(df, "doc_id", "text", lm=ref_lm)
         .select("doc_id", F.col("logprob").alias("__lp_ref")))
    want = (s.join(r, "doc_id")
            .withColumn("nll_self",
                        F.round(-F.col("__lp_self") / F.col("n_bigrams"), 6))
            .withColumn("nll_ref",
                        F.round(-F.col("__lp_ref") / F.col("n_bigrams"), 6))
            .withColumn("excess",
                        F.round(F.col("nll_self") - F.col("nll_ref"), 6))
            .drop("__lp_self", "__lp_ref")
            .orderBy(F.desc("excess"), F.asc("doc_id")).limit(10))
    cols = ["doc_id", "n_bigrams", "nll_self", "nll_ref", "excess"]
    assert [tuple(row) for row in got.select(*cols).collect()] == \
        [tuple(row) for row in want.select(*cols).collect()]


# ----------------------------------------- checkpointed star-fold
def test_duplicate_groups_chain_multiround(spark):
    """A 40-node path graph forces multiple large/small-star rounds over
    the checkpointed edge set; every node must land in component 0."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long")
    got = duplicate_groups(pairs).collect()
    assert len(got) == 41
    assert {r["group_id"] for r in got} == {0}


def test_keep_best_column_surface_unchanged(spark):
    """The tied-frame rewrite must not leak internal columns."""
    rows = [(1, "same text here", 1.0), (2, "same text here", 2.0),
            (3, "unrelated body", 5.0)]
    out = HF.dedup_keep_best(
        spark.createDataFrame(rows, "id long, text string, score double"),
        "id", "text", "score")
    assert out.columns == ["id", "text", "score", "n_dups"]
    assert {r["id"]: r["n_dups"] for r in out.collect()} == {2: 2, 3: 1}
