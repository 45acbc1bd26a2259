"""Scale probe: run the write path + reads/table services + 3
representative TPC-H plans + dedup family + incremental-dedup at a ×N
upscale of a base sf dir and report per-row minima, so "designed for
100 TB" claims get at least one measured scaling datapoint past sf0.1.

Usage::

    python tools/scale_probe.py [base_sf_dir] [factor] [runs] [rows_csv]
    # defaults: /root/testdata/sf0.1  10  2  (all rows)
    # rows_csv: comma list of row names to probe (e.g.
    # "simhash_dedup,semantic_dedup" for the x100 near-linear-row probe)
    # — only the tables those rows read are replicated/built.

The upscale replicates each table ``factor`` times with shifted keys.
Replica text is salted (every 2nd word tagged with the replica index) so
replicas are NOT near-duplicates of each other under ANY measured metric
(5-gram Jaccard AND token simhash) — duplicate density stays comparable
to the base corpus instead of exploding ×factor, which would change WHAT
is measured, not just how much. Embeddings get a small deterministic
componentwise per-replica perturbation for the same reason (replica
cosine ≈0.958, never ≥0.99). The upscaled parquet is cached under
/tmp/scale_probe_v2_<factor>x_<base> and reused.

Output: one JSON line per run plus a final ``minima`` line with
seconds-per-row; compare against the same rows probed at factor=1.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ALL_TABLES = ("documents", "embeddings", "orders", "lineitem")

# which upscaled tables each probe row reads (rows not listed here only
# need `documents`)
ROW_TABLES = {
    "bulk_insert": {"orders"}, "upsert": {"orders"},
    "cow_snapshot": {"orders"}, "clustering": {"orders"},
    "mor_snapshot": {"orders"}, "mor_compaction": {"orders"},
    "mor_ro_read": {"orders"},
    "tpch_q1": {"orders", "lineitem"}, "tpch_q6": {"orders", "lineitem"},
    "tpch_q4": {"orders", "lineitem"},
    "semantic_dedup": {"embeddings"}, "ann_int8": {"embeddings"},
}


def tables_for(only: set | None) -> set:
    if only is None:
        return set(ALL_TABLES)
    need = set()
    for row in only:
        need |= ROW_TABLES.get(row, {"documents"})
    return need


def build_upscale(spark, base: str, factor: int, out: str,
                  tables: set | None = None) -> None:
    from pyspark.sql import functions as F

    from hoodie_spark.sources import load_table

    tables = set(ALL_TABLES) if tables is None else set(tables)
    if "lineitem" in tables:
        tables.add("orders")  # FK stride comes from the orders key space
    os.makedirs(out, exist_ok=True)

    def replicas(df, key, n, mutate=None):
        parts = []
        for i in range(factor):
            p = df.withColumn(key, F.col(key) + F.lit(int(i * n)))
            if mutate is not None and i > 0:
                p = mutate(p, i)
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def salt_text(df, i):
        # tag every 2nd word with the replica index: replicas stop being
        # near-duplicates under EVERY dedup metric the probe measures —
        # char-5-gram Jaccard far below 0.8 AND 32-bit token simhash
        # hamming >> 3 (measured on the real corpus: stride 7 left the
        # replica-pair hamming at median 3, i.e. 57% of replica pairs
        # were still simhash near-dups, so ×100 inflated duplicate
        # density ~2700× and the probe measured answer growth, not plan
        # scaling; stride 2 → median 8, 2.4% ≤ 3) — while token counts
        # stay realistic
        words = F.split(F.col("text"), " ")
        salted = F.zip_with(
            words, F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, j: F.when(j % 2 == i % 2,
                                F.concat(w, F.lit(f"_{i}"))).otherwise(w))
        return df.withColumn("text", F.concat_ws(" ", salted))

    def perturb_emb(df, i):
        # componentwise deterministic perturbation that varies per
        # (replica, component) — a per-replica CONSTANT shift barely
        # rotates a unit vector (cosine stays ≈1, and replicas i, i+5
        # were byte-identical), so ×factor multiplied semantic-dup
        # density instead of holding it; amp 0.01 on the unit-norm
        # embeddings gives replica cosine ≈0.958, 0% of pairs ≥0.99
        # (measured) — far from dedup thresholds, near enough for
        # realistic cluster geometry
        idx = F.sequence(F.lit(0), F.size(F.col("embedding")) - 1)
        return df.withColumn(
            "embedding",
            F.zip_with(F.col("embedding"), idx,
                       lambda x, j: x + F.lit(0.01)
                       * ((F.lit(i * 31) + j * 17) % 13 - 6)))

    nparts = max(8, factor)  # keep partitions executor-memory-sized at x100
    if "documents" in tables:
        docs = load_table(spark, base, "documents")
        n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
        replicas(docs, "doc_id", n_docs, salt_text) \
            .coalesce(nparts).write.mode("overwrite") \
            .parquet(os.path.join(out, "documents.parquet"))
    if "embeddings" in tables:
        emb = load_table(spark, base, "embeddings")
        n_emb = emb.agg(F.max("vec_id")).first()[0] + 1
        replicas(emb, "vec_id", n_emb, perturb_emb) \
            .coalesce(nparts).write.mode("overwrite") \
            .parquet(os.path.join(out, "embeddings.parquet"))
    if "orders" in tables:
        orders = load_table(spark, base, "orders")
        n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
        replicas(orders, "o_orderkey", n_ord) \
            .coalesce(nparts).write.mode("overwrite") \
            .parquet(os.path.join(out, "orders.parquet"))
    if "lineitem" in tables:
        # lineitem shifts l_orderkey by the SAME stride as orders so the
        # orders<->lineitem FK alignment (TPC-H joins) survives the upscale
        lineitem = load_table(spark, base, "lineitem")
        replicas(lineitem, "l_orderkey", n_ord) \
            .coalesce(2 * nparts).write.mode("overwrite") \
            .parquet(os.path.join(out, "lineitem.parquet"))


def probe_once(spark, sf_dir: str, only: set | None = None) -> dict:
    from pyspark.sql import functions as F

    from hoodie_spark import HoodieTable
    from hoodie_spark import functions as HF
    from hoodie_spark.sources import load_table
    from hoodie_spark.streaming import IncrementalDeduper

    timings: dict[str, float] = {}

    def want(*names):
        return only is None or any(n in only for n in names)

    def timed(name, fn):
        if not want(name):
            return None
        # isolate rows from each other: the dedup/ANN operators pin
        # intermediates (persist) that otherwise accumulate across rows
        # and skew later rows via memory pressure (measured: second-run
        # containment 19.7 -> 75 s purely from earlier rows' pins)
        spark.catalog.clearCache()
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    docs = None
    if want("exact_dedup", "minhash_dedup", "simhash_dedup",
            "containment_dedup", "dsir_select", "incremental_dedup",
            "lm_perplexity", "quality_classifier", "distribution_shift",
            "substring_dedup", "ppl_buckets", "corpus_report",
            "decontaminate_near", "lm_perplexity_64k", "domain_mixture",
            "leakage_split", "dedup_keep_best", "token_budget_select",
            "dedup_jaccard", "dedup_edit", "line_dedup", "ngram_novelty"):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text")
    work = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        if want("bulk_insert", "upsert", "cow_snapshot", "clustering",
                "mor_snapshot", "mor_compaction", "mor_ro_read",
                "tpch_q1", "tpch_q6", "tpch_q4"):
            orders = load_table(spark, sf_dir, "orders")
            upd = (orders.filter(F.col("o_orderkey") % 10 == 0)
                   .withColumn("o_orderstatus", F.lit("X")))
        if want("bulk_insert", "upsert", "cow_snapshot", "clustering"):
            tbl = HoodieTable.create(
                spark, os.path.join(work, "orders"), "orders_sp",
                ["o_orderkey"], "o_orderdate",
                partition_expr="cast(year(o_orderdate) as string)")
            timed("bulk_insert", lambda: tbl.bulk_insert(orders))
            timed("upsert", lambda: tbl.upsert(upd))
            # ---- reads + table services at scale (VERDICT r10 task #2):
            # the read-side parity bar is the per-slice MOR merge
            # (HoodieMergeOnReadRDD.scala:72-76) — snapshot cost must track
            # the DIRTY slices, not the table size
            timed("cow_snapshot", lambda: tbl.snapshot().count())
            timed("clustering",
                  lambda: tbl.cluster(sort_cols=["o_orderkey"]))
        if want("mor_snapshot", "mor_compaction", "mor_ro_read"):
            from hoodie_spark import TableType
            mor = HoodieTable.create(
                spark, os.path.join(work, "orders_mor"), "orders_mor_sp",
                ["o_orderkey"], "o_orderdate",
                table_type=TableType.MERGE_ON_READ,
                partition_expr="cast(year(o_orderdate) as string)")
            mor.bulk_insert(orders)
            mor.upsert(upd)  # delta log -> dirty slices for the merge read
            timed("mor_snapshot", lambda: mor.snapshot().count())
            timed("mor_compaction", lambda: mor.compact())
            timed("mor_ro_read", lambda: mor.read_optimized().count())
        if want("tpch_q1", "tpch_q6", "tpch_q4"):
            # ---- 3 representative TPC-H plans over the upscaled parquet:
            # q1 (scan+agg), q6 (pushdown filter+agg), q4 (orders|x|
            # lineitem exists-join). Plan scaling, same SQL the bench runs.
            import __spark_entry__ as entry
            lineitem = load_table(spark, sf_dir, "lineitem")
            orders.createOrReplaceTempView("sp_orders")
            lineitem.createOrReplaceTempView("sp_lineitem")
            for qn in ("tpch_q1", "tpch_q6", "tpch_q4"):
                sql = entry.TPCH_SQL[qn].format(
                    l="sp_lineitem", o="sp_orders")
                timed(qn, lambda s=sql: spark.sql(s).collect())
        timed("exact_dedup",
              lambda: HF.exact_dedup(docs, ["text"], "doc_id").count())
        timed("minhash_dedup", lambda: HF.minhash_candidate_pairs(
            docs, "doc_id", "text").count())
        timed("simhash_dedup", lambda: HF.simhash_dup_pairs(
            docs, "doc_id", "text", bits=32, max_distance=3).count())
        if want("semantic_dedup", "ann_int8"):
            emb = load_table(spark, sf_dir, "embeddings")
            # hold EXPECTED CLUSTER SIZE constant across scales (the
            # operator's documented contract: n_clusters ~ corpus size /
            # target cluster size) — a fixed n_clusters at 10x data would
            # measure quadratic within-cluster growth, i.e. the documented
            # anti-pattern
            n_vec = emb.count()
            timed("semantic_dedup", lambda: HF.semantic_dedup(
                emb, "vec_id", "embedding",
                n_clusters=max(16, n_vec // 125),
                threshold=0.99).count())
            queries = emb.filter(F.col("vec_id") % 997 == 0)  # ~n/1000
            timed("ann_int8", lambda: HF.int8_topk(
                emb, queries, "vec_id", "embedding", k=10).count())
        # guarded path: the EXACT join goes quadratic on the synthetic
        # template corpus (measured: 19.7 s at sf0.1 -> 558 s + OOM at
        # x10 — PLANS round 10); the hot-shingle cap is the documented
        # production setting for template-heavy data
        timed("containment_dedup", lambda: HF.containment_dedup_pairs(
            docs, "doc_id", "text", threshold=0.9,
            max_prefix_df=64).count())
        # DSIR: target = a fixed slice of the corpus; cost model is two
        # bounded aggs + one broadcast scoring pass, so it must scale
        # like a pair of corpus scans
        timed("dsir_select", lambda: HF.dsir_select(
            docs, docs.filter(F.col("doc_id") % 10 == 0), "doc_id",
            "text", k=200).count())
        # round-12 text-statistics family: all bounded-output censuses +
        # broadcast scoring — each must scale like a fixed number of
        # corpus scans
        timed("lm_perplexity", lambda: HF.bigram_perplexity(
            docs, "doc_id", "text", vocab_size=64).count())
        timed("quality_classifier", lambda: HF.quality_classifier(
            docs.select("doc_id", "text",
                        (F.col("doc_id") % 2).alias("y")),
            "doc_id", "text", "y", dim=64, iters=3).count())
        timed("distribution_shift", lambda: HF.distribution_shift(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            "text", buckets=64).agg(F.sum("psi")).collect())
        # CDC-chunked substring dedup: in-row md5-per-position boundary
        # detection (CPU-linear, no shuffle) + two chunk-keyed shuffles
        timed("substring_dedup", lambda: HF.exact_substring_dedup(
            docs, "doc_id", "text").count())
        timed("ppl_buckets", lambda: HF.perplexity_buckets(
            docs, "doc_id", "text", n_buckets=3)
            .groupBy("bucket").count().collect())
        timed("corpus_report", lambda: HF.corpus_report(
            docs, "text").collect())
        # round-13 rows. 64k-vocab scoring (the broadcast-join mapping +
        # adaptive model path): the LM is trained OUTSIDE the timed
        # lambda so the row isolates scoring scaling — the production
        # shape (train on a trusted sample, score the big corpus)
        if want("lm_perplexity_64k"):
            lm64k = HF.train_bigram_lm(docs, "text", vocab_size=65536)
            timed("lm_perplexity_64k", lambda: HF.bigram_perplexity(
                docs, "doc_id", "text", lm=lm64k).count())
        if want("domain_mixture"):
            docs_src = load_table(spark, sf_dir, "documents").select(
                "doc_id", "source", "text")
            lm_dm = HF.train_bigram_lm(
                docs.filter(F.col("doc_id") % 10 == 0), "text",
                vocab_size=64)
            timed("domain_mixture", lambda: HF.domain_mixture_weights(
                docs_src, "source", "doc_id", "text",
                lm=lm_dm).collect())
        if want("leakage_split"):
            timed("leakage_split", lambda: HF.leakage_safe_split(
                docs, "doc_id", "text")
                .groupBy("split").count().collect())
        if want("dedup_keep_best"):
            timed("dedup_keep_best", lambda: HF.dedup_keep_best(
                docs.withColumn("score", F.length("text")),
                "doc_id", "text", "score")
                .agg(F.sum("n_dups"), F.count(F.lit(1))).collect())
        if want("token_budget_select"):
            # budget scales with the corpus so the cut stays mid-corpus
            # (a fixed budget at x100 would measure the aggregate pass
            # only; the filter itself is map-only either way)
            n_docs = docs.count()
            timed("token_budget_select", lambda: HF.token_budget_select(
                docs.withColumn("n_chars", F.length("text")).withColumn(
                    "n_tokens",
                    HF.token_count(F.col("text")).cast("long")),
                "n_tokens", 30 * n_docs, ["n_chars", "doc_id"])
                .agg(F.count(F.lit(1)), F.max("cum_tokens")).collect())
        # round-14 rows: the distinct-text-grain exact verifiers and the
        # line/novelty censuses. The exact pairwise verifiers run with a
        # tight hot-group cap at scale — the containment_dedup precedent
        # (max_prefix_df=64 above): the ×100 synthetic corpus is
        # band-collisional ACROSS salted replicas (top band group 7.5k
        # rows; 146.5M raw candidate pairs measured), so the UNGUARDED
        # exact verify is O(1e8) pairs by construction — the documented
        # boundary where production routes template-heavy corpora
        # through the cap (or sig_near_pairs). cap=512 keeps duplicate
        # clusters connected through pivots while bounding per-group
        # pairs at O(n·cap).
        if want("dedup_jaccard"):
            timed("dedup_jaccard", lambda: HF.jaccard_dedup_pairs(
                docs, "doc_id", "text", threshold=0.8,
                max_band_rows=512).count())
        if want("dedup_edit"):
            timed("dedup_edit", lambda: HF.edit_dedup_pairs(
                docs, "doc_id", "text", threshold=0.9,
                max_band_rows=512).count())
        if want("line_dedup"):
            timed("line_dedup", lambda: HF.line_dedup(
                docs.select("doc_id", F.concat_ws(
                    "\n", F.col("text"),
                    F.lit("subscribe to our newsletter"),
                    F.concat(F.lit("tail "),
                             (F.col("doc_id") % 7).cast("string")))
                    .alias("text")),
                "doc_id", "text")
                .agg(F.sum(F.length("text"))).collect())
        if want("ngram_novelty"):
            timed("ngram_novelty", lambda: HF.ngram_novelty(
                docs, "doc_id", "text", n=3)
                .agg(F.avg("novel_frac"), F.count(F.lit(1))).collect())
        # eval side fixed-size (the production contract): the probe
        # scales ONLY the corpus side
        timed("decontaminate_near", lambda: HF.decontaminate_near(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter((F.col("doc_id") % 20 == 0)
                        & (F.col("doc_id") < 10000)),
            "doc_id", "text", threshold=0.8).count())
        if want("incremental_dedup"):
            inc_tbl = HoodieTable.create(
                spark, os.path.join(work, "docs_inc"), "docs_inc_sp",
                ["doc_id"], None)
            dd = IncrementalDeduper(inc_tbl, "doc_id", "text",
                                    threshold=0.8)
            seed = docs.filter(F.col("doc_id") % 2 == 0)
            inc_tbl.insert(dd.filter_batch(seed))
            dd.advance(seed)
            batch2 = (docs.filter(F.col("doc_id") % 2 == 1)
                      .unionByName(seed.select(
                          (F.col("doc_id") + 100_000_000).alias("doc_id"),
                          "text")))

            def inc_round():
                inc_tbl.insert(dd.filter_batch(batch2))
                dd.advance(batch2)
            timed("incremental_dedup", inc_round)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return timings


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = (set(sys.argv[4].split(",")) if len(sys.argv) > 4
            and sys.argv[4] else None)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    need = tables_for(only)
    if factor == 1:
        sf_dir = base
    else:
        # v2: density-matched salting (stride-2 words, componentwise
        # embedding perturbation) — the v1 cache would poison results
        sf_dir = (f"/tmp/scale_probe_v2_{factor}x_"
                  f"{os.path.basename(base.rstrip('/'))}")
        missing = {t for t in need
                   if not os.path.exists(os.path.join(sf_dir,
                                                      f"{t}.parquet"))}
        if missing:
            t0 = time.time()
            build_upscale(spark, base, factor, sf_dir, tables=missing)
            print(json.dumps({"built": sf_dir, "tables": sorted(missing),
                              "sec": round(time.time() - t0, 1)}))
    all_runs = []
    for r in range(runs):
        t = probe_once(spark, sf_dir, only=only)
        all_runs.append(t)
        print(json.dumps({"run": r, "timings": t}))
    minima = {k: min(t[k] for t in all_runs) for k in all_runs[0]}
    print(json.dumps({"base": base, "factor": factor, "minima": minima}))


if __name__ == "__main__":
    main()
