"""Gopher-style document quality heuristics for pre-training corpora.

Public method reference: the repetition-and-shape filters published with
Gopher (Rae et al., 2021, "Scaling Language Models", App. A1.1) and reused
by C4 / Dolma / RefinedWeb: word-count bounds, mean word length band,
alphabetic-word fraction, stopword floor, within-document repetition
(duplicate span fraction, top-bigram fraction). The reference engine
(Apache Hudi) has no such operators — these extend the rebuild's
training-data surface the way `functions/text.py` extends it for
tokenization/langid (see SURVEY.md "LLM-data-pipeline operators").

Scale design: every metric is a pure Column expression over the row's own
text — map-only, whole-stage-codegen'd, no shuffle, no UDF. At 100 TB the
gate runs at scan speed and Catalyst pushes the surviving-row projection
into the reader. The in-row top-bigram count is O(distinct_bigrams x
bigrams) per document — CPU-bounded per row, no memory amplification.

Float parity with the DuckDB oracle: fractions are compared through
``F.round(x, 6)`` on both engines (see tools/check_oracle.py conventions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "words", "word_spans", "gopher_metrics", "gopher_filter",
    "GOPHER_DEFAULTS",
]

# marker stopwords shared with text.lang_id's English scorer — presence of
# a few is Gopher's "has common English words" rule
_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that", "for",
              "with"]


def words(col) -> Column:
    """Lowercased whitespace-normalized word array (same normalization as
    pipeline.word_ngrams, so metrics and n-gram ops agree on tokens)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")


def word_spans(col, width: int = 4) -> Column:
    """Consecutive ``width``-word spans (the corpus's "lines" for
    repetition checks: the synthetic docs are single-line, and fixed-width
    spans are the deterministic stand-in CCNet applies to over-long
    lines). Last partial span kept. The token array is bound once as a
    lambda variable — interpreted HOFs have no CSE, so inlining ``words``
    into the per-span lambda would re-tokenize once per span."""

    def _spans(toks):
        n_spans = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_spans, F.lit(1))),
            lambda i: F.array_join(
                F.slice(toks, (i - F.lit(1)) * width + F.lit(1), width), " "))

    return F.element_at(F.transform(F.array(words(col)), _spans), 1)


def gopher_metrics(col, span_width: int = 4) -> Column:
    """Struct of the Gopher shape/repetition signals for one document:

    - ``n_words``          word count
    - ``mean_word_len``    mean characters per word
    - ``alpha_word_frac``  fraction of words containing an alphabetic char
    - ``stopword_hits``    how many distinct marker stopwords appear
    - ``dup_span_frac``    1 - distinct/total over ``span_width``-word spans
    - ``top_bigram_frac``  occurrences of the most frequent word bigram /
      total bigrams (Gopher's top-2-gram character fraction, word-based)
    """
    # Two performance rules shape this expression (higher-order functions
    # run INTERPRETED in Spark — no whole-stage codegen, no subexpression
    # elimination):
    # 1. tokenize ONCE: the token array is bound as an aggregate lambda
    #    variable, so the regexp+split chain runs once per row instead of
    #    once per metric;
    # 2. top-bigram via sort + longest-equal-run fold, O(n log n) — the
    #    naive distinct x filter shape re-evaluates the bigram array per
    #    distinct element and measured ~40 ms/doc at sf0.1.
    def _metrics(t):
        n = F.size(t).cast("double")
        safe_n = F.greatest(n, F.lit(1.0))
        mean_wl = F.aggregate(
            t, F.lit(0.0), lambda acc, w: acc + F.length(w)) / safe_n
        alpha = F.size(F.filter(t, lambda w: w.rlike("[a-z]"))).cast(
            "double") / safe_n
        stop_hits = F.size(F.array_intersect(
            F.array_distinct(t),
            F.array(*[F.lit(s) for s in _STOPWORDS])))
        n_spans = F.greatest(
            F.ceil(F.size(t) / F.lit(float(span_width))).cast("int"),
            F.lit(1))
        spans = F.transform(
            F.sequence(F.lit(1), n_spans),
            lambda i: F.array_join(
                F.slice(t, (i - F.lit(1)) * span_width + F.lit(1),
                        span_width), " "))
        dup_span = F.lit(1.0) - F.size(F.array_distinct(spans)).cast(
            "double") / F.greatest(F.size(spans).cast("double"), F.lit(1.0))
        n_bg = F.size(t) - F.lit(1)
        bg = F.when(n_bg >= 1, F.transform(
            F.sequence(F.lit(1), F.greatest(n_bg, F.lit(1))),
            lambda i: F.array_join(F.slice(t, i, 2), " "))
        ).otherwise(F.array().cast("array<string>"))
        run0 = F.struct(F.lit("").alias("p"), F.lit(0).alias("r"),
                        F.lit(0).alias("b"))

        def _step(a, x):
            r = F.when(x == a["p"], a["r"] + 1).otherwise(F.lit(1))
            return F.struct(x.alias("p"), r.alias("r"),
                            F.greatest(a["b"], r).alias("b"))

        top_count = F.aggregate(F.array_sort(bg), run0, _step,
                                lambda a: a["b"])
        top_bg = F.when(n_bg >= 1, top_count.cast("double")
                        / n_bg.cast("double")).otherwise(F.lit(0.0))
        return F.struct(
            F.size(t).alias("n_words"),
            mean_wl.alias("mean_word_len"),
            alpha.alias("alpha_word_frac"),
            stop_hits.alias("stopword_hits"),
            dup_span.alias("dup_span_frac"),
            top_bg.alias("top_bigram_frac"),
        )

    zero = F.struct(
        F.lit(0).alias("n_words"), F.lit(0.0).alias("mean_word_len"),
        F.lit(0.0).alias("alpha_word_frac"), F.lit(0).alias("stopword_hits"),
        F.lit(0.0).alias("dup_span_frac"), F.lit(0.0).alias("top_bigram_frac"))
    return F.aggregate(F.array(words(col)), zero, lambda _acc, t: _metrics(t))


GOPHER_DEFAULTS = {
    # bands picked for the synthetic corpus scale (docs are 10-99 words);
    # production values from the paper: 50..100k words, mwl 3..10, etc.
    "min_words": 20, "max_words": 100_000,
    "min_mean_word_len": 2.0, "max_mean_word_len": 12.0,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_span_frac": 0.4,
    "max_top_bigram_frac": 0.2,
}


def gopher_filter(df: DataFrame, text_col: str, span_width: int = 4,
                  keep_col: str | None = None, **overrides) -> DataFrame:
    """Apply the Gopher repetition/shape gate. With ``keep_col`` the rows
    are kept and flagged (for audit / weighting); without it, failing rows
    are dropped. Thresholds compare on round(x, 6) so knife-edge floats
    can't flip between engines."""
    th = {**GOPHER_DEFAULTS, **overrides}
    m = gopher_metrics(text_col, span_width)
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    # bind the metrics struct ONCE as a lambda variable: referencing the
    # struct's fields directly would re-inline the whole expression per
    # condition (Catalyst simplifies GetStructField(CreateStruct) back to
    # the field expr), multiplying the per-row cost ~8x
    keep = F.aggregate(
        F.array(m), F.lit(True),
        lambda acc, s: acc
        & (s["n_words"] >= th["min_words"])
        & (s["n_words"] <= th["max_words"])
        & (r6(s["mean_word_len"]) >= th["min_mean_word_len"])
        & (r6(s["mean_word_len"]) <= th["max_mean_word_len"])
        & (r6(s["alpha_word_frac"]) >= th["min_alpha_word_frac"])
        & (s["stopword_hits"] >= th["min_stopword_hits"])
        & (r6(s["dup_span_frac"]) <= th["max_dup_span_frac"])
        & (r6(s["top_bigram_frac"]) <= th["max_top_bigram_frac"]))
    if keep_col is not None:
        return df.withColumn(keep_col, keep)
    return df.filter(keep)
