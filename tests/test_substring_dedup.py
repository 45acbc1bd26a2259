"""Exact-substring dedup via content-defined chunking
(functions/dedup.exact_substring_dedup)."""

from pyspark.sql import functions as F

from hoodie_spark import functions as HF

SHARED = ("the quick brown fox jumps over the lazy dog again and again "
          "forever and ever without stopping at all and then some more "
          "unique trailing words to make the passage long enough")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _norm(s):
    import re
    return re.sub(r"\s+", " ", s).strip().lower()


def test_unaligned_shared_passage_cut_keep_first(spark):
    df = _docs(spark, [
        (1, "prefix one " + SHARED + " suffix alpha"),
        (2, "a totally different much longer prefix two " + SHARED + " z"),
        (3, "independent document with no shared passage at all here")])
    out = {r["doc_id"]: r for r in
           HF.exact_substring_dedup(df, "doc_id", "text").collect()}
    # first occurrence keeps everything
    assert out[1]["n_chunks_kept"] == out[1]["n_chunks_total"]
    assert out[1]["text"] == _norm("prefix one " + SHARED + " suffix alpha")
    # the later copy loses its duplicated chunks
    assert out[2]["n_chunks_kept"] < out[2]["n_chunks_total"]
    assert SHARED.lower() not in out[2]["text"]
    # untouched independent doc
    assert out[3]["n_chunks_kept"] == out[3]["n_chunks_total"]
    assert out[3]["text"] == _norm(df.filter("doc_id=3")
                                   .first()["text"])


def test_short_shared_strings_survive(spark):
    # every doc shares short phrases; nothing reaches min_dup_len=1000
    df = _docs(spark, [(i, f"the cat sat {i} on the mat") for i in range(5)])
    out = HF.exact_substring_dedup(df, "doc_id", "text",
                                   min_dup_len=1000).collect()
    assert len(out) == 5
    assert all(r["n_chunks_kept"] == r["n_chunks_total"] for r in out)


def test_identical_docs_second_loses_long_chunks(spark):
    df = _docs(spark, [(1, SHARED), (2, SHARED)])
    out = {r["doc_id"]: r for r in
           HF.exact_substring_dedup(df, "doc_id", "text").collect()}
    assert out[1]["text"] == _norm(SHARED)
    assert 2 not in out or len(out[2]["text"]) < len(out[1]["text"])


def test_intra_doc_repetition_cut(spark):
    # keep-one applies WITHIN a document too (Lee et al. removes every
    # later occurrence, same doc or not) — min_docs=1 turns it on for
    # single-doc corpora
    df = _docs(spark, [(1, SHARED + " middle filler " + SHARED)])
    out = HF.exact_substring_dedup(df, "doc_id", "text",
                                   min_docs=1).collect()[0]
    assert out["n_chunks_kept"] < out["n_chunks_total"]
    assert len(out["text"]) < len(_norm(SHARED + " middle filler "
                                        + SHARED))


def test_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "tiny"), (2, "als"), (3, "")])
    out = {r["doc_id"]: r for r in
           HF.exact_substring_dedup(df, "doc_id", "text").collect()}
    assert out[1]["n_chunks_total"] == 1 and out[1]["text"] == "tiny"


def test_alignment_robustness_vs_span_dedup(spark):
    # the duplicated passage starts at word offsets 1 and 3 — no fixed
    # 4-word span lines up across the two copies, so dedup_spans sees
    # nothing; content-defined chunking cuts it anyway
    passage = ("alpha bravo charlie delta echo foxtrot golf hotel india "
               "juliet kilo lima mike november oscar papa quebec romeo")
    df = _docs(spark, [(1, "pre " + passage),
                       (2, "one two three " + passage)])
    spans = {r["doc_id"]: r for r in
             HF.dedup_spans(df, "doc_id", "text", span_width=4).collect()}
    assert all(r["n_spans_kept"] == r["n_spans_total"]
               for r in spans.values())  # span dedup is alignment-blind
    sub = {r["doc_id"]: r for r in
           HF.exact_substring_dedup(df, "doc_id", "text",
                                    min_dup_len=12).collect()}
    assert sub[2]["n_chunks_kept"] < sub[2]["n_chunks_total"]


def test_partitioning_invariant(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    a = HF.exact_substring_dedup(docs.repartition(1), "doc_id", "text")
    b = HF.exact_substring_dedup(docs.repartition(13, "doc_id"),
                                 "doc_id", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_hot_chunk_no_window_skew(spark):
    """A boilerplate passage shared by most of the corpus (the 100 TB
    skew case: license header / nav bar). The dup-marking must be a
    per-chunk aggregate + join, NEVER a window over chunk content — a
    window would buffer every occurrence of the hot chunk in one task
    and collect a per-row doc set (round-12 verdict What's-wrong #2)."""
    n = 300
    rows = [(i, f"unique head {i} " + SHARED + f" unique tail {i}")
            for i in range(n)]
    rows += [(n + i, f"clean document number {n + i} with its own words")
             for i in range(20)]
    df = _docs(spark, rows)
    out = HF.exact_substring_dedup(df, "doc_id", "text")
    # plan shape: zero Window operators anywhere in the dedup
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "dup-marking regressed to a window"
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 0 (smallest id) keeps the boilerplate; every later copy cut
    assert SHARED.lower() in got[0]["text"]
    cut = sum(1 for i in range(1, n)
              if i not in got or SHARED.lower() not in got[i]["text"])
    assert cut == n - 1
    # untouched clean docs survive whole
    for i in range(n, n + 20):
        assert got[i]["n_chunks_kept"] == got[i]["n_chunks_total"]
