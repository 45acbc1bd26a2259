"""Text analysis over a document corpus — pure Column expressions.

All functions return Columns built from ``pyspark.sql.functions`` higher-order
array functions, so they run inside whole-stage codegen with zero Python
round-trips and zero shuffles: at 100 TB these are map-only stages whose cost
is dominated by the Parquet scan itself.

Hashing is md5-hex (stable across engines — the DuckDB oracle in
``__spark_entry__.py`` reproduces every function literally).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens", "token_count", "regex_token_count", "char_ngrams", "lang_id",
    "LANG_PROFILES", "quality_score", "fingerprint", "kmin_fingerprint",
    "collapse_repeats", "char_entropy",
]


def tokens(col) -> Column:
    """Whitespace tokens, lower-cased, empties dropped."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


# One regex "word" = a run of alphanumerics OR a single non-space symbol —
# the shape a byte-level BPE pre-tokenizer produces (letters/digits/punct
# split). Plain character classes only, so Java regex and DuckDB's RE2
# agree on every input.
_REGEX_TOKEN = "[a-z0-9]+|[^a-z0-9 \\t\\n\\r]"


def regex_token_count(col) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(col), F.lit(_REGEX_TOKEN))


def char_ngrams(col, n: int = 5) -> Column:
    """Distinct character n-gram shingles of the normalized text.

    Normalization: lowercase, whitespace runs collapsed to a single space.
    Returns an empty array when the text is shorter than ``n``.
    Map-side only — the array lives inside the row.
    """
    col = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))

    # bind the normalized text ONCE as a lambda variable: interpreted HOFs
    # have no CSE, so inlining `norm` into the per-shingle lambda would
    # re-run the regexp chain once per shingle
    def _shingles(m):
        return F.when(
            F.length(m) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(m) - F.lit(n - 1)),
                    lambda i: m.substr(i, F.lit(n)),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(norm), _shingles), 1)


# Marker-token profiles for the n-gram/stopword language heuristic.
# (Demonstrative classifier: score = #marker tokens present; winner picked
# by fixed priority order en>de>es>fr>zh on ties.)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def _lang_score(col, lang: str) -> Column:
    toks = F.array_distinct(tokens(col))
    markers = F.array(*[F.lit(m) for m in LANG_PROFILES[lang]])
    return F.size(F.array_intersect(toks, markers))


def lang_id(col) -> Column:
    """Heuristic language id: argmax of marker-token hit counts.

    Ties resolve by the fixed order en, de, es, fr, zh (first max wins);
    a document with zero hits everywhere classifies as 'und'.
    """
    scores = {lang: _lang_score(col, lang) for lang in LANG_PROFILES}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):  # build when-chain in priority order
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best <= 0, F.lit("und")).otherwise(expr)


def quality_score(col) -> Column:
    """Heuristic document quality in [0, 1].

    0.4 * length_score  (saturating at 200 chars)
    + 0.3 * alpha ratio (alphabetic chars / chars)
    + 0.2 * stopword presence (en-marker hits / 5, capped at 1)
    + 0.1 * (1 - symbol ratio)  (non-alnum-non-space chars / chars)
    Pure per-row double arithmetic — bit-identical across engines.
    """
    col = F.col(col) if isinstance(col, str) else col
    n = F.length(col).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(F.lower(col), "[^a-z]", "")).cast("double")
    symbols = F.length(F.regexp_replace(F.lower(col), "[a-z0-9 \\t\\n\\r]", "")).cast("double")
    stop = F.least(_lang_score(col, "en").cast("double") / F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (alpha / safe_n)
        + F.lit(0.2) * stop
        + F.lit(0.1) * (F.lit(1.0) - symbols / safe_n)
    )


def collapse_repeats(col) -> Column:
    """Collapse runs of consecutive duplicate whitespace tokens to a single
    occurrence — the cheap in-document repetition repair (boilerplate
    stutter, copy-paste echo) that complements the *gate* in
    ``quality.gopher_metrics``: instead of dropping a repetitive document,
    this keeps it with the stutter removed.

    Returns ``struct(text_clean string, n_removed int)``. Whitespace runs
    normalize to a single space in the output (same convention as
    :func:`fingerprint`). Case-sensitive: tokens must match exactly to
    collapse.

    Pure higher-order Column expression — map-only, zero shuffle, runs in
    whole-stage codegen; at 100 TB this is scan-bound. The token array is
    bound ONCE as a lambda variable (interpreted HOFs have no CSE — see
    :func:`char_ngrams`), so the split/filter chain runs once per row, not
    once per token.
    """
    col = F.col(col) if isinstance(col, str) else col
    raw = F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))

    def _out(toks):
        # keep token i (0-based) iff it differs from its predecessor;
        # element_at is 1-based so element_at(toks, i) IS the predecessor
        kept = F.filter(
            toks,
            lambda x, i: (i == F.lit(0)) | (x != F.element_at(toks, i)))
        return F.struct(
            F.array_join(kept, " ").alias("text_clean"),
            (F.size(toks) - F.size(kept)).alias("n_removed"))

    return F.element_at(F.transform(F.array(raw), _out), 1)


def char_entropy(col) -> Column:
    """Shannon entropy (bits) of the character distribution of the
    normalized text — the cheap gibberish / boilerplate signal: natural
    prose sits around 4-4.5 bits, single-character spam near 0, uniform
    random base64 near 6.

    Normalization matches :func:`fingerprint`: lowercase, whitespace runs
    collapsed to a single space, trimmed. Empty text scores 0.0.

    Scale shape: entirely in-row — the char array is sorted and reduced to
    run lengths with higher-order functions, so this is a map-only stage
    with zero shuffle (the exploded groupBy a naive implementation would
    use shuffles one row PER CHARACTER — at 100 TB that is the corpus
    itself, again). Each per-char term is rounded to 6 decimals and summed
    as decimal(18,6) so the fold order cannot perturb the result — the
    DuckDB oracle reproduces the value bit-for-bit from its exploded form.
    """
    col = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))

    # bind the sorted char array ONCE (interpreted HOFs have no CSE); the
    # run-end index array likewise binds once for the run-length lambda
    def _runs(cs):
        n = F.size(cs)
        ends = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == n) | (F.element_at(cs, i) !=
                                  F.element_at(cs, i + F.lit(1))))

        def _entropy(ends_):
            counts = F.transform(
                F.sequence(F.lit(1), F.size(ends_)),
                lambda j: F.when(j == F.lit(1), F.element_at(ends_, 1))
                .otherwise(F.element_at(ends_, j) -
                           F.element_at(ends_, j - F.lit(1))))
            terms = F.transform(
                counts,
                lambda c: F.round(
                    (c.cast("double") / n) * F.log2(c.cast("double") / n), 6)
                .cast("decimal(18,6)"))
            # re-cast each partial sum: decimal + decimal widens precision
            # and aggregate() requires merge type == zero type
            return -F.aggregate(
                terms, F.lit(0).cast("decimal(18,6)"),
                lambda acc, t: (acc + t).cast("decimal(18,6)")).cast("double")

        return F.element_at(F.transform(F.array(ends), _entropy), 1)

    chars = F.array_sort(F.filter(F.split(norm, ""), lambda c: c != F.lit("")))
    out = F.element_at(F.transform(F.array(chars), _runs), 1)
    return F.when(F.length(norm) == 0, F.lit(0.0)).otherwise(out)


def fingerprint(col) -> Column:
    """Exact-content fingerprint: md5 of the whitespace-normalized text."""
    return F.md5(F.concat_ws(" ", tokens(col)))


def kmin_fingerprint(col, n: int = 5, k: int = 8) -> Column:
    """k-min sketch fingerprint (winnowing-style): md5 over the k smallest
    shingle hashes. Two documents sharing most shingles collide with high
    probability; robust to small edits, unlike :func:`fingerprint`."""
    hashes = F.array_sort(F.transform(char_ngrams(col, n), F.md5))
    return F.md5(F.concat_ws("", F.slice(hashes, 1, k)))
