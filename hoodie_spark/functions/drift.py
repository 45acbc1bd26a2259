"""Distribution-shift diagnostics: hashed-token histograms, PSI and KL.

The training-data drift check every production pipeline runs before
mixing a new crawl/source into a corpus: compare the new slice's token
distribution against a reference distribution and quantify the shift as
Population Stability Index and KL divergence per feature bucket. (PSI is
the standard model-monitoring statistic; KL is its information-theoretic
sibling — both over the same smoothed bucket probabilities.)

Feature space: hashed token buckets (``int(md5(token)[:4], 16) % B`` —
the engine-portable hash plane DSIR / hash_sample / the classifier use),
so the statistic is schema-free (any text column) and the bucket census
is a bounded-output aggregation. Probabilities are add-one smoothed over
the B-bucket alphabet: ``p_b = (c_b + 1) / (N + B)`` — no empty-bucket
infinities, same smoothing family as unigram_logprob.

Engine parity: the log-ratio is rounded to 6 decimals at the bucket
(≤ B values), PSI/KL terms to 9; divisions and subtractions are single
IEEE-754 operations identical in any engine, so an independent SQL
engine reproduces every row bit-for-bit.

Scale shape (100 TB): ONE map-side-combined aggregation per side whose
output is ≤ B rows (the shuffle carries partial counts, not tokens);
the spine join and the arithmetic are driver-trivial B-row work. The
histogram is a SUM monoid, so it can also be maintained incrementally
(streaming/drift.py) and even un-merged exactly from CDC before-images.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["token_histogram", "distribution_shift", "shift_from_counts"]

_MAX_BUCKETS = 65536  # 16-bit md5 hash plane


def _bucket_expr(text_col: str | Column, buckets: int) -> Column:
    from .quality import words

    return F.transform(
        words(text_col),
        lambda t: (F.conv(F.substring(F.md5(t), 1, 4), 16, 10)
                   .cast("int") % F.lit(buckets)))


def token_histogram(df: DataFrame, text_col: str,
                    buckets: int = 64) -> DataFrame:
    """Per-bucket token counts ``(bucket, cnt)`` over the full bucket
    spine (unobserved buckets carry 0) — bounded output, map-side
    combined."""
    if not 2 <= buckets <= _MAX_BUCKETS:
        raise ValueError(f"buckets must be in [2, {_MAX_BUCKETS}], "
                         f"got {buckets}")
    counts = (df.select(F.explode(_bucket_expr(text_col, buckets))
                        .alias("bucket"))
              .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))
    spine = df.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("bucket"))
    return (spine.join(counts, "bucket", "left")
            .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")))


def shift_from_counts(ref_hist: DataFrame, cur_hist: DataFrame,
                      buckets: int) -> DataFrame:
    """PSI/KL rows from two ``(bucket, cnt)`` histograms (each must cover
    the full spine). Shared by the batch path and the incrementally-
    maintained monitor — identical arithmetic, so maintained state
    hash-matches the batch statistic."""
    n_ref = ref_hist.agg(F.sum("cnt")).first()[0] or 0
    n_cur = cur_hist.agg(F.sum("cnt")).first()[0] or 0
    dr = float(n_ref + buckets)
    dc = float(n_cur + buckets)
    j = (ref_hist.withColumnRenamed("cnt", "ref_cnt")
         .join(cur_hist.withColumnRenamed("cnt", "cur_cnt"), "bucket"))
    p_ref = (F.col("ref_cnt") + F.lit(1.0)) / F.lit(dr)
    p_cur = (F.col("cur_cnt") + F.lit(1.0)) / F.lit(dc)
    lr = F.round(F.log(p_cur / p_ref), 6)
    return j.select(
        "bucket", "ref_cnt", "cur_cnt",
        lr.alias("log_ratio"),
        F.round((p_cur - p_ref) * lr, 9).alias("psi"),
        F.round(p_cur * lr, 9).alias("kl"))


def distribution_shift(ref: DataFrame, cur: DataFrame, text_col: str,
                       buckets: int = 64) -> DataFrame:
    """Per-bucket drift of ``cur`` against ``ref``:
    ``(bucket, ref_cnt, cur_cnt, log_ratio, psi, kl)`` — exactly
    ``buckets`` rows. ``sum(psi)`` is the PSI statistic (rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate);
    ``sum(kl)`` is D_KL(cur || ref) over the smoothed buckets."""
    return shift_from_counts(token_histogram(ref, text_col, buckets),
                             token_histogram(cur, text_col, buckets),
                             buckets)
