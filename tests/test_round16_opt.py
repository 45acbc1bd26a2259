"""Round-16 optimization guards: the single-census LM training and the
star-forest fixpoint detection must keep results bit-identical.

Covers: train_bigram_lm's one-census-action shape (model tables equal
the pre-r16 three-action shape's values, broadcast tables stay
LocalRelation-backed), the _is_star_forest fixpoint test (forests
detected, non-forests not, and duplicate_groups output unchanged on
graphs that converge in 0 / 1 / many rounds), and the reliable-
checkpoint option when a checkpoint dir is configured.
"""

import math

import pytest
from pyspark.sql import functions as F

from hoodie_spark.functions.components import (_is_star_forest,
                                               duplicate_groups)
from hoodie_spark.functions.lm import _pairs, train_bigram_lm


# ------------------------------------------------ star-forest fixpoint
def _edges(spark, rows):
    return spark.createDataFrame(rows, "hi long, lo long")


def test_star_forest_detects_forest(spark):
    # two stars: {1,2,3 -> 0} and {7 -> 5}; roots never appear as hi
    assert _is_star_forest(_edges(spark, [(1, 0), (2, 0), (3, 0), (7, 5)]))


def test_star_forest_empty_is_forest(spark):
    assert _is_star_forest(_edges(spark, []))


def test_star_forest_rejects_path(spark):
    # 2 -> 1 -> 0: node 1 is both member and root
    assert not _is_star_forest(_edges(spark, [(2, 1), (1, 0)]))


def test_star_forest_rejects_multi_root(spark):
    # member 5 points at two roots
    assert not _is_star_forest(_edges(spark, [(5, 0), (5, 1)]))


def test_duplicate_groups_zero_rounds_on_star_input(spark):
    """exact_text_pairs-style input is already a min-rooted star forest:
    the fold must stop immediately with the input as the answer."""
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (9, 11)], "id_a long, id_b long")
    got = {r["id"]: r["group_id"] for r in duplicate_groups(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 9: 9, 11: 9}


def test_duplicate_groups_two_components_merge(spark):
    """A graph whose first star round does NOT yet yield the forest."""
    pairs = spark.createDataFrame(
        [(3, 4), (2, 3), (1, 2), (10, 12), (12, 14)],
        "id_a long, id_b long")
    got = {r["id"]: r["group_id"] for r in duplicate_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 12: 10, 14: 10}


def test_duplicate_groups_reliable_checkpoint(spark, tmp_table_path):
    """With a checkpoint dir configured the fold must use reliable
    checkpoints (cluster fault tolerance) and produce the same answer."""
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(tmp_table_path)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long")
        got = {r["id"]: r["group_id"]
               for r in duplicate_groups(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1}
    finally:
        # reset: checkpointDir is a plain var on the Scala SparkContext
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None


# ------------------------------------------- single-census LM training
def _old_shape_model(corpus, text_col, vocab, vocab_size):
    """The pre-r16 training tail verbatim: separate lp and unseen
    computations, each its own census run."""
    denom_slots = float(vocab_size + 1)
    pc = (_pairs(corpus, None, text_col, vocab)
          .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb")))
    ctx = pc.groupBy("w1").agg(F.sum("cb").alias("cw"))
    lp = (pc.join(ctx, "w1")
          .select("w1", "w2",
                  F.round(F.log((F.col("cb") + F.lit(1.0))
                                / (F.col("cw") + F.lit(denom_slots))), 6)
                  .alias("lp")))
    unseen = ctx.select(
        "w1",
        F.round(F.log(F.lit(1.0) / (F.col("cw") + F.lit(denom_slots))), 6)
        .alias("unseen_lp"))
    return lp, unseen


def test_train_bigram_lm_matches_old_shape(spark):
    rows = [(f"alpha beta gamma tok{i % 4} beta alpha end",)
            for i in range(40)] + [("",), (None,), ("single",)]
    df = spark.createDataFrame(rows, "text string")
    lm = train_bigram_lm(df, "text", vocab_size=6)
    assert lm.broadcast
    old_lp, old_unseen = _old_shape_model(df, "text", lm.vocab, 6)
    assert sorted(map(tuple, lm.pair_lp.collect())) == \
        sorted(map(tuple, old_lp.collect()))
    assert sorted(map(tuple, lm.ctx_lp.collect())) == \
        sorted(map(tuple, old_unseen.collect()))
    assert lm.oov_lp == round(math.log(1.0 / 7.0), 6)


def test_train_bigram_lm_broadcast_tables_are_local(spark):
    """Broadcast-model tables must be driver-local (lineage severed —
    LogicalRDD/LocalRelation over collected rows, the same shape the
    pre-r16 code produced): scoring plans embed values, never re-run
    the census."""
    df = spark.createDataFrame(
        [("a b c a b",), ("b c d",)], "text string")
    lm = train_bigram_lm(df, "text", vocab_size=4)
    for t in (lm.pair_lp, lm.ctx_lp):
        opt = t._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in opt or "LocalRelation" in opt, opt
        assert "Aggregate" not in opt and "Join" not in opt, opt


def test_train_bigram_lm_empty_corpus(spark):
    df = spark.createDataFrame([("",), (None,)], "text string")
    lm = train_bigram_lm(df, "text", vocab_size=4)
    assert lm.pair_lp.count() == 0
    assert lm.ctx_lp.count() == 0


def test_train_bigram_lm_non_broadcast_path(spark):
    """Force the distributed-model path (broadcast_model_rows=0) and
    check values + that unpersist releases the census pin."""
    rows = [(f"alpha beta tok{i % 3} gamma",) for i in range(20)]
    df = spark.createDataFrame(rows, "text string")
    lm = train_bigram_lm(df, "text", vocab_size=5,
                         broadcast_model_rows=0)
    assert not lm.broadcast
    bc = train_bigram_lm(df, "text", vocab_size=5)
    assert sorted(map(tuple, lm.pair_lp.collect())) == \
        sorted(map(tuple, bc.pair_lp.collect()))
    assert sorted(map(tuple, lm.ctx_lp.collect())) == \
        sorted(map(tuple, bc.ctx_lp.collect()))
    assert lm._census is not None and lm._census.is_cached
    lm.unpersist()
    assert not lm._census.is_cached


def test_perplexity_buckets_values_stable(spark):
    """End-to-end: the bucket assignment over a self-trained LM is
    unchanged by the single-census training."""
    rows = [(i, f"alpha beta gamma tok{i % 7} delta beta alpha")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from hoodie_spark import functions as HF

    out = {r["doc_id"]: (r["ppl"], r["bucket"])
           for r in HF.perplexity_buckets(df, "doc_id", "text",
                                          n_buckets=3,
                                          vocab_size=8).collect()}
    assert len(out) == 60
    assert {b for _, b in out.values()} == {0, 1, 2}
    # deterministic: same inputs, same buckets on a second run
    out2 = {r["doc_id"]: (r["ppl"], r["bucket"])
            for r in HF.perplexity_buckets(df, "doc_id", "text",
                                           n_buckets=3,
                                           vocab_size=8).collect()}
    assert out == out2


# ------------------------------------- containment at distinct-text grain
def _brute_containment(texts, threshold, ngram=5):
    """O(n^2) reference: containment over distinct char-ngram sets."""
    import itertools

    shs = {i: {t[k:k + ngram] for k in range(len(t) - ngram + 1)}
           for i, t in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(shs), 2):
        sa, sb = shs[a], shs[b]
        if not sa or not sb:
            continue
        mn = min(len(sa), len(sb))
        inter = len(sa & sb)
        if inter >= math.ceil(threshold * mn - 1e-9):
            out[(a, b)] = round(inter / mn, 6)
    return out


def test_containment_dup_heavy_matches_bruteforce(spark):
    """Exact copies collapse to one verify row per distinct text; the
    expanded id-pair set must still equal the O(n^2) model, intra-copy
    pairs at exactly 1.0."""
    from hoodie_spark import functions as HF

    base = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox jumps over the lazy dog again and again!!",
        2: "a completely different document about spark query planning",
    }
    texts = {}
    for rep in range(25):           # 25 exact copies of each distinct text
        for i, t in base.items():
            texts[100 * rep + i] = t
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in HF.containment_dedup_pairs(
               df, "doc_id", "text", threshold=0.9).collect()}
    assert got == _brute_containment(texts, 0.9)
    # every intra-copy pair is present and exactly 1.0
    copies0 = sorted(k for k in texts if k % 100 == 0)
    for i in range(len(copies0) - 1):
        assert got[(copies0[i], copies0[i + 1])] == 1.0


def test_containment_plan_runs_verify_at_hash_grain(spark):
    """The optimized plan must shingle and verify above the distinct-text
    aggregate (grouping on the md5 content hash), not per document."""
    from hoodie_spark import functions as HF

    df = spark.createDataFrame(
        [(i, f"document number {i % 3} with shared boilerplate text")
         for i in range(30)], "doc_id long, text string")
    out = HF.containment_dedup_pairs(df, "doc_id", "text", threshold=0.9)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__ch" in plan and "array_intersect" in plan
    # document frequency keeps doc weights: the census sums __n
    assert "sum(__n" in plan


def test_containment_df_guard_unchanged_on_dup_heavy(spark):
    """max_prefix_df decides on SUMMED copy counts (document frequency),
    so a shingle common only through exact copies still trips the cap."""
    from hoodie_spark import functions as HF

    # one distinct boilerplate text copied 40x + one unique doc embedded
    rows = [(i, "boilerplate header shared by every copy of this doc")
            for i in range(40)]
    rows.append((99, "boilerplate header shared by ever"))  # contained prefix
    df = spark.createDataFrame(rows, "doc_id long, text string")
    loose = {(r.id_a, r.id_b) for r in HF.containment_dedup_pairs(
        df, "doc_id", "text", threshold=0.9, max_prefix_df=100).collect()}
    tight = {(r.id_a, r.id_b) for r in HF.containment_dedup_pairs(
        df, "doc_id", "text", threshold=0.9, max_prefix_df=5).collect()}
    # the 40-copy group's shingles have df=40 > 5: doc 99's every prefix
    # shingle is capped out, so its cross pairs disappear under the tight
    # cap while the intra-copy pairs (no prefix probe needed) remain
    assert {(a, b) for a, b in loose if a != 99 and b != 99} <= loose
    assert all(99 not in p for p in tight)
    assert {(a, b) for (a, b) in tight} == \
        {(a, b) for (a, b) in loose if 99 not in (a, b)}
