"""Trainable text-quality classifier: hashed-feature logistic regression
fit by distributed gradient descent.

The fastText-style quality gate real training-data pipelines use (e.g.
GPT-3/LLaMA "classify against a trusted corpus" filtering): features are
hashed bag-of-words frequencies, the model is logistic regression, and
each training iteration is ONE Spark aggregation — executors compute
partial gradient sums map-side, the driver holds only the (dim+1)-float
weight vector. No MLlib, no RDDs: the gradient is a Column-expression
fold, so the heavy pass (tokenize + hash + weigh) stays in whole-stage
codegen and the shuffle per iteration carries at most ``dim + 1`` partial
sums per task.

Feature map: token -> bucket ``int(md5(token)[:4], 16) % dim`` (the same
engine-portable hash plane DSIR and hash_sample use, so an independent
SQL engine reproduces training bit-for-bit); a document's feature value
for bucket b is ``count_b / n_tokens``; a constant bias slot rides as
virtual bucket ``dim``.

Engine-parity discipline (what makes iterative float training
hash-matchable against a SQL oracle): every nonlinearity is rounded at a
fixed grain — the logit to 6 decimals, the sigmoid to 6, weights and
per-token gradient contributions to 12 — and every cross-row sum runs in
DECIMAL, which is exact and order-independent, so Spark partial
aggregation and the oracle's grouped SUM cannot drift. Between the
rounding grain (1e-6 / 1e-12) and IEEE-754 arithmetic error (~1e-16),
there are ten orders of magnitude of slack.

Scale shape (100 TB): the tokenized/hashed training frame is persisted
once and reused by every iteration; per iteration the work is one
map-only logit/residual pass plus one explode + groupBy(bucket) whose
output is ≤ dim+1 rows (map-side combine makes the shuffle weight
O(tasks × dim)). Driver state is the weight vector — bytes, not rows.
Scoring is a single map-only pass with the weights inlined as literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hashed_buckets", "train_hashed_lr", "score_hashed_lr",
           "quality_classifier"]

# 4 md5 hex nibbles = 16 bits of portable hash plane
_MAX_DIM = 65536


def hashed_buckets(text_col: str | Column, dim: int) -> Column:
    """Per-token feature buckets for one document: map-only, portable
    (md5-derived, reproducible by any SQL engine)."""
    if not 2 <= dim <= _MAX_DIM:
        raise ValueError(f"dim must be in [2, {_MAX_DIM}], got {dim}")
    from .quality import words

    return F.transform(
        words(text_col),
        lambda t: (F.conv(F.substring(F.md5(t), 1, 4), 16, 10)
                   .cast("int") % F.lit(dim)))


def _logit(bkts: Column, n: Column, weights: list[float],
           dim: int) -> Column:
    """round(w · x + bias, 6) where x_b = count_b / n — computed as the
    DECIMAL-exact in-row sum of per-token weight lookups divided by n
    (identical algebra, one pass over the token array, order-free)."""
    wlit = F.array(*[F.lit(w).cast("decimal(18,12)")
                     for w in weights[:dim]])
    dot = F.aggregate(
        bkts, F.lit(0).cast("decimal(28,12)"),
        lambda acc, b: (acc + F.element_at(wlit, b + 1))
        .cast("decimal(28,12)"))
    return F.round(dot.cast("double") / n + F.lit(weights[dim]), 6)


def _sigmoid6(z: Column) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def train_hashed_lr(df: DataFrame, text_col: str, label_col: str,
                    dim: int = 64, iters: int = 3,
                    lr: float = 1.0) -> list[float]:
    """Fit logistic regression on (``text_col``, binary ``label_col``) by
    ``iters`` full-batch gradient-descent steps from zero weights.

    Returns ``dim + 1`` floats (the last is the bias). Deterministic: the
    same data yields bit-identical weights regardless of partitioning,
    and an independent engine replaying the same recipe agrees exactly.
    """
    base = (df.select(hashed_buckets(text_col, dim).alias("__bk"),
                      F.col(label_col).cast("double").alias("__y"))
            .withColumn("__n", F.size("__bk"))
            .filter(F.col("__n") >= 1)
            .persist())
    try:
        n_docs = base.count()
        if n_docs == 0:
            raise ValueError("no trainable rows (all documents empty)")
        w = [0.0] * (dim + 1)
        for _ in range(iters):
            resid = (_sigmoid6(_logit(F.col("__bk"), F.col("__n"), w, dim))
                     - F.col("__y"))
            # bias rides as virtual bucket `dim` with contribution resid
            # (not resid/n), so ONE explode + groupBy computes the whole
            # gradient; contributions are rounded then DECIMAL-summed —
            # exact and order-free
            contrib = F.when(
                F.col("__b") == dim,
                F.round(F.col("__r"), 12)).otherwise(
                F.round(F.col("__r") / F.col("__n"), 12)) \
                .cast("decimal(28,12)")
            grad_rows = (base
                         .withColumn("__r", resid)
                         .select(F.explode(F.concat(
                             F.col("__bk"),
                             F.array(F.lit(dim)))).alias("__b"), "__r",
                             "__n")
                         .select("__b", contrib.alias("__c"))
                         .groupBy("__b").agg(F.sum("__c").alias("__g"))
                         .collect())
            grad = {r["__b"]: float(r["__g"]) for r in grad_rows}
            w = [round(w[b] - lr * grad.get(b, 0.0) / n_docs, 12)
                 for b in range(dim + 1)]
        return w
    finally:
        base.unpersist()


def score_hashed_lr(df: DataFrame, id_col: str, text_col: str,
                    weights: list[float]) -> DataFrame:
    """Map-only scoring pass: ``(id_col, score)`` with
    ``score = round(sigmoid(round(w·x + bias, 6)), 6)``. Empty documents
    (NULL, empty, or whitespace-only text) score at the bias alone
    (x = 0): ``sigmoid(round(bias, 6))`` — never NULL.

    The explicit branch matters because ``words('')`` is ``['']`` (one
    phantom token that would hash into a real bucket and pull in that
    bucket's weight) and aggregating over a NULL token array would make
    the score NULL."""
    dim = len(weights) - 1
    txt = F.coalesce(F.col(text_col), F.lit(""))
    bkts = hashed_buckets(txt, dim)
    # \s-aware emptiness (trim() strips only spaces, but words()
    # normalizes all whitespace — the two must agree on "empty")
    empty = F.length(F.regexp_replace(txt, r"\s", "")) == 0
    score = F.when(
        empty, _sigmoid6(F.round(F.lit(weights[dim]), 6))).otherwise(
        _sigmoid6(_logit(bkts, F.size(bkts), weights, dim)))
    return df.select(F.col(id_col), score.alias("score"))


def quality_classifier(df: DataFrame, id_col: str, text_col: str,
                       label_col: str, dim: int = 64, iters: int = 3,
                       lr: float = 1.0) -> DataFrame:
    """Train on ``df`` and score it: ``(id_col, label, score, predicted)``
    — the self-scored quality gate (train on trusted labels, then filter
    on ``score``)."""
    w = train_hashed_lr(df, text_col, label_col, dim=dim, iters=iters,
                        lr=lr)
    scored = score_hashed_lr(df, id_col, text_col, w)
    return (scored.join(df.select(F.col(id_col),
                                  F.col(label_col).cast("long")
                                  .alias("label")), id_col)
            .select(id_col, "label", "score",
                    (F.col("score") >= 0.5).cast("long")
                    .alias("predicted")))
