"""Byte-pair-encoding tokenizer: distributed training histogram +
Arrow-batched encoding.

Public method reference: Sennrich et al. 2016 (the original BPE-for-NLP
algorithm); the training shape mirrors every production tokenizer trainer
(HuggingFace tokenizers, SentencePiece): the ONLY corpus-scale pass is the
word-frequency histogram — a map-side-partial groupBy whose shuffle
carries (word, partial_count), bounded by distinct words, not corpus
size. Merge learning then runs on the bounded histogram (capped at
``max_words`` rows, standard practice) on the driver; at 100 TB the
histogram for 10M distinct words is ~100 MB — the part Spark must
distribute is the counting, and that is the part that IS distributed.

Encoding applies the learned merge ranks greedily per word. That is an
inherently sequential per-string loop, so it rides the sanctioned slow
path: an Arrow-batched pandas UDF (vectorized transfer, NumPy-speed
Python inner loop), never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import pandas as pd  # annotation resolution for the pandas UDF signature
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_encode", "bpe_token_count"]

_EOW = "</w>"


def _word_histogram(df: DataFrame, text_col: str,
                    max_words: int) -> list[tuple[str, int]]:
    from .quality import words
    rows = (df.select(F.explode(words(text_col)).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("w")).limit(max_words)
            .collect())
    return [(r["w"], int(r["n"])) for r in rows]


def bpe_train(df: DataFrame, text_col: str, num_merges: int = 64,
              max_words: int = 50_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Deterministic:
    ties on pair frequency break lexicographically. Returns the ordered
    merge list [(left, right), ...] — rank = list position."""
    hist = _word_histogram(df, text_col, max_words)
    words = [([*w] + [_EOW], n) for w, n in hist]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        top_n = max(counts.values())
        if top_n < 2:
            break
        # max by count; lexicographically smallest pair on ties
        a, b = min(p for p, n in counts.items() if n == top_n)
        merges.append((a, b))
        merged = a + b
        new_words = []
        for syms, n in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, n))
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = [*word] + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(text_col: str | Column,
               merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for the text column. Greedy
    lowest-rank-first merging per word (the standard BPE apply order).
    Arrow-batched pandas UDF — the merge table is tiny and closure-
    captured (a broadcast in all but name); per-batch work is pure local
    CPU, so the stage scales with cores like any map."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _enc(s: pd.Series) -> pd.Series:
        import re

        # ASCII whitespace class, NOT \s: training's histogram tokenizes
        # with Spark/Java regexp_replace where \s is ASCII-only, while
        # Python's \s also matches U+00A0 etc. — the two sides must agree
        # on word boundaries or learned merges silently never apply
        ws = re.compile(r"[ \t\n\r\f\v]+")
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            toks = []
            for w in ws.sub(" ", text.lower()).strip(" ").split(" "):
                if w:
                    toks.extend(_encode_word(w, ranks))
            out.append(toks)
        return pd.Series(out)

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return _enc(col)


def bpe_token_count(text_col: str | Column,
                    merges: list[tuple[str, str]]) -> Column:
    """Token count under the learned vocabulary — the budget metric shard
    packing / sampling actually bill by once a tokenizer exists."""
    return F.size(bpe_encode(text_col, merges))
