"""Similarity search over an embedding column (``array<float>``).

Three tiers:

* :func:`brute_force_topk` — exact cosine top-k. The query set is
  broadcast (it's small by definition); the corpus is scanned once,
  map-side, and only ``(query, id, score)`` candidates reach the top-k
  window. At 100 TB this is a single pass with no corpus shuffle — the
  right baseline, and exact.
* :func:`lsh_bucket_topk` — sign-LSH (random-hyperplane) bucketing: corpus
  and queries hash to ``planes``-bit buckets; only same-bucket pairs are
  scored. Sub-linear work per query, approximate recall.
* :func:`ivf_topk` — IVF-style coarse quantization: a deterministic
  centroid set (first ``n_centroids`` corpus vectors — no training step,
  reproducible), every vector assigned to its nearest centroid (broadcast
  join, map-side), queries probe the ``n_probe`` nearest centroid lists.
  This is the 100 TB path: the inverted lists can be written as a
  ``partitionBy(centroid)`` parquet layout so a probe reads only
  ``n_probe/n_centroids`` of the data (partition pruning does the rest).

All math is double-precision Column expressions (``zip_with`` +
left-to-right ``aggregate`` fold — reproducible, engine-portable).
Hyperplanes are derived from md5, so the DuckDB oracle replicates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot", "l2_norm", "cosine", "normalize", "random_projection",
    "sign_lsh_key",
    "brute_force_topk", "lsh_bucket_topk", "ivf_topk",
    "kmeans_centroids", "write_ivf_index", "ivf_topk_from_index",
    "pq_codebooks", "pq_codebooks_trained", "pq_encode", "pq_reconstruct",
    "pq_topk", "write_pq_index", "write_ivfpq_index",
    "ivfpq_topk_from_index",
]


def dot(a, b) -> Column:
    """Left-to-right fold of elementwise products (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a) -> Column:
    """Unit-L2 copy of the vector (null-safe: zero vectors stay zero)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def random_projection(vec, out_dim: int, dim: int) -> list[Column]:
    """Johnson–Lindenstrauss-style dimension reduction: ``out_dim`` dot
    products against the same deterministic ±1 hyperplanes the sign-LSH
    uses (md5-derived, so re-runs and the SQL oracle agree bit-for-bit).
    Returns one Column per output component — map-only, codegen'd; at
    100 TB this collapses a wide embedding scan to ``out_dim`` doubles
    before any shuffle."""
    mat = _plane_matrix(out_dim, dim)
    cast = F.transform(vec, lambda x: x.cast("double"))
    return [dot(cast, F.array(*[F.lit(w) for w in row])).alias(f"p{p}")
            for p, row in enumerate(mat)]


def _plane_matrix(planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes: +1 when the first hex digit of
    ``md5('p<p>:<i>')`` is 0–7. Identical to the DuckDB oracle derivation —
    computed once in Python instead of per (plane × dim × row) in Spark."""
    import hashlib

    return [
        [1.0 if int(hashlib.md5(f"p{p}:{i}".encode()).hexdigest()[0], 16) < 8
         else -1.0 for i in range(dim)]
        for p in range(planes)
    ]


def sign_lsh_key(vec, planes: int, dim: int | None = None) -> Column:
    """Random-hyperplane signature: ``planes``-char '0'/'1' string.

    Plane p's component for dimension i is +1 when the first hex digit of
    ``md5('p<p>:<i>')`` is in 0–7, else −1 — deterministic, shared with the
    DuckDB oracle, no stored model.

    When ``dim`` is known, the ±1 matrix is precomputed driver-side and
    embedded as array literals — the per-row cost is ``planes`` dot products
    (no md5 at all). Without ``dim`` the plane components are derived inline
    per element (planes × dim interpreted md5s per row — avoid on bulk runs).
    """
    vec = F.col(vec) if isinstance(vec, str) else vec
    if dim is not None:
        mat = _plane_matrix(planes, dim)
        bits = []
        for p in range(planes):
            row = F.array(*[F.lit(s) for s in mat[p]])
            proj = F.aggregate(F.zip_with(vec, row, lambda x, s: x * s),
                               F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
        # zip_with null-pads on length mismatch, which would silently zero
        # every bit and collapse mismatched vectors into one bucket — fail
        # loudly instead. Null vectors (missing embeddings) map to a null
        # key, never the error branch: size(NULL) is null, so without the
        # isNull arm the when-condition itself would be null and the row
        # would fall into raise_error with an unreadable null-concat message.
        return (F.when(vec.isNull(), F.lit(None).cast("string"))
                .when(F.size(vec) == dim, F.concat(*bits))
                .otherwise(F.raise_error(F.concat(
                    F.lit(f"sign_lsh_key: vector length != dim={dim} (got "),
                    F.size(vec).cast("string"), F.lit(")")))))

    def bit(p):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x * F.when(
                    F.md5(F.concat(F.lit("p"), p.cast("string"), F.lit(":"), i.cast("string")))
                     .substr(1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"),
                    F.lit(1.0)).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))
    return F.concat_ws("", F.transform(F.sequence(F.lit(0), F.lit(planes - 1)), bit))


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_v"),
        l2_norm(v).alias(f"{prefix}_n"),
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 10) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Self-matches are excluded. Broadcast(queries) ⨯ corpus is a map-side
    nested loop; the shuffle into the per-query top-k window carries
    |corpus|·|queries| rows of ~24 bytes. Exact — use as recall baseline;
    for large corpora prefer :func:`ivf_topk`.
    """
    c = _prep(corpus, id_col, vec_col, "c")
    q = _prep(queries, id_col, vec_col, "q")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot("c_v", "q_v") / (F.col("c_n") * F.col("q_n"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                    vec_col: str, k: int = 10, planes: int = 6,
                    dim: int | None = None) -> DataFrame:
    """Approximate top-k scoring only same-sign-LSH-bucket pairs."""
    c = _prep(corpus, id_col, vec_col, "c").withColumn("bucket", sign_lsh_key("c_v", planes, dim))
    q = _prep(queries, id_col, vec_col, "q").withColumn("bucket", sign_lsh_key("q_v", planes, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot("c_v", "q_v") / (F.col("c_n") * F.col("q_n"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _assign_centroids(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per corpus vector (cosine argmax, ties → smaller
    centroid id): map-side broadcast loop, one pass over the corpus."""
    assign_w = Window.partitionBy("c_id").orderBy(F.desc("aff"), F.asc("k_id"))
    return (
        c.crossJoin(F.broadcast(cent))
        .select("c_id", "c_v", "c_n", F.col("k_id"),
                (dot("c_v", "k_v") / (F.col("c_n") * F.col("k_n"))).alias("aff"))
        .withColumn("rnk", F.row_number().over(assign_w))
        .filter(F.col("rnk") == 1)
        .select("c_id", "c_v", "c_n", F.col("k_id").alias("centroid"))
    )


def kmeans_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                     n_centroids: int = 16, iters: int = 4,
                     sample_fraction: float | None = None,
                     seed: int = 42) -> DataFrame:
    """Sampled Lloyd's k-means codebook for :func:`ivf_topk`.

    The scale shape: each iteration is ONE map pass over the (optionally
    sampled) corpus — broadcast the k×dim centroid matrix, argmax-assign,
    then a (centroid, dimension)-keyed partial-sum shuffle of k×dim rows;
    only the k×dim codebook is ever collected. At 100 TB you train on a
    ~0.1% sample (set ``sample_fraction``) and the cost is independent of
    corpus size. Deterministic: seeded sample, smallest-id init, and empty
    clusters keep their previous centroid.

    Returns a DataFrame with columns ``(id_col, vec_col)`` (ids 0..k-1),
    ready to pass as ``ivf_topk(..., centroids=...)``.
    """
    spark = corpus.sparkSession
    c = _prep(corpus, id_col, vec_col, "c").filter(F.col("c_n") > 0)
    if sample_fraction is not None:
        c = c.sample(False, sample_fraction, seed=seed)
    c = c.persist()
    try:
        init = [r[0] for r in
                c.orderBy("c_id").limit(n_centroids).select("c_v").collect()]
        cents: list[list[float]] = [list(v) for v in init]
        for _ in range(max(0, iters)):
            cent_df = spark.createDataFrame(
                [(i, v) for i, v in enumerate(cents)],
                "k_id int, k_v array<double>").withColumn("k_n", l2_norm("k_v"))
            stats = (_assign_centroids(c, F.broadcast(cent_df))
                     .select("centroid", F.posexplode("c_v").alias("pos", "x"))
                     .groupBy("centroid", "pos")
                     .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
                     .collect())
            new = {int(r["centroid"]): dict() for r in stats}
            for r in stats:
                new[int(r["centroid"])][int(r["pos"])] = r["s"] / r["n"]
            cents = [
                [by_pos[p] for p in sorted(by_pos)] if (by_pos := new.get(i))
                else cents[i]  # empty cluster: keep previous centroid
                for i in range(len(cents))
            ]
    finally:
        c.unpersist()
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(cents)],
        f"{id_col} int, __v array<double>").withColumnRenamed("__v", vec_col)


def write_ivf_index(corpus: DataFrame, centroids: DataFrame, id_col: str,
                    vec_col: str, path: str) -> None:
    """Persist the inverted lists as a ``partitionBy(centroid)`` parquet
    layout — the 100 TB serving shape: a probe then reads only
    ``n_probe / n_centroids`` of the data via partition pruning."""
    c = _prep(corpus, id_col, vec_col, "c")
    cent = _prep(centroids, id_col, vec_col, "k")
    (_assign_centroids(c, cent)
     .select(F.col("c_id").alias(id_col), F.col("c_v").alias(vec_col),
             F.col("c_n").alias("__norm"), "centroid")
     .write.partitionBy("centroid").mode("overwrite").parquet(path))


def ivf_topk_from_index(spark, index_path: str, centroids: DataFrame,
                        queries: DataFrame, id_col: str, vec_col: str,
                        k: int = 10, n_probe: int = 4) -> DataFrame:
    """Probe a persisted :func:`write_ivf_index` layout. The
    ``centroid IN (...)`` filter prunes at the partition-directory level,
    so only the probed inverted lists are scanned."""
    cent = _prep(centroids, id_col, vec_col, "k")
    q = _prep(queries, id_col, vec_col, "q")
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("aff"), F.asc("k_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("q_id", "q_v", "q_n", F.col("k_id"),
                (dot("q_v", "k_v") / (F.col("q_n") * F.col("k_n"))).alias("aff"))
        .withColumn("rnk", F.row_number().over(probe_w))
        .filter(F.col("rnk") <= n_probe)
        .select("q_id", "q_v", "q_n", F.col("k_id").alias("centroid")))
    wanted = [r[0] for r in probes.select("centroid").distinct().collect()]
    index = (spark.read.parquet(index_path)
             .filter(F.col("centroid").isin(wanted))
             .select(F.col(id_col).alias("c_id"),
                     F.col(vec_col).alias("c_v"),
                     F.col("__norm").alias("c_n"), "centroid"))
    scored = (
        index.join(F.broadcast(probes), "centroid")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot("c_v", "q_v") / (F.col("c_n") * F.col("q_n"))).alias("cos"))
        .distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids default to the ``n_centroids`` corpus vectors with the
    smallest ids (deterministic; callers with a trained codebook pass
    ``centroids``). Assignment and probing both broadcast the centroid set,
    so corpus-side work is one map pass; the probe join hits only
    ``n_probe`` of ``n_centroids`` inverted lists.
    """
    c = _prep(corpus, id_col, vec_col, "c")
    if centroids is None:
        centroids = corpus.orderBy(F.col(id_col)).limit(n_centroids)
    cent = _prep(centroids, id_col, vec_col, "k")

    assigned = _assign_centroids(c, cent)

    # each query probes its n_probe nearest centroids
    q = _prep(queries, id_col, vec_col, "q")
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("aff"), F.asc("k_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("q_id", "q_v", "q_n", F.col("k_id"),
                (dot("q_v", "k_v") / (F.col("q_n") * F.col("k_n"))).alias("aff"))
        .withColumn("rnk", F.row_number().over(probe_w))
        .filter(F.col("rnk") <= n_probe)
        .select("q_id", "q_v", "q_n", F.col("k_id").alias("centroid"))
    )

    scored = (
        assigned.join(F.broadcast(probes), "centroid")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (dot("c_v", "q_v") / (F.col("c_n") * F.col("q_n"))).alias("cos"),
        )
        .distinct()  # a pair can surface via multiple probed lists
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# --------------------------------------------------------------------- PQ
def pq_codebooks(corpus: DataFrame, id_col: str, vec_col: str,
                 m: int = 8, k: int = 16) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: subspace ``j``'s codes
    are the ``j``-th sub-vectors of the first ``k`` corpus rows (same
    no-training reproducible convention as ivf_topk's centroid init —
    swap in per-subspace kmeans_centroids sub-vectors for trained books).
    Returns ``books[j][c] = list[ds floats]`` with ``ds = dim // m``.
    Driver data is k rows — bounded."""
    rows = (corpus.select(F.col(id_col).alias("i"),
                          F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy("i").limit(k).collect())
    dim = len(rows[0]["v"])
    if dim % m:
        # a silent dim//m would drop the trailing dims from every code —
        # scores would quietly ignore part of the vector
        raise ValueError(f"embedding dim {dim} not divisible by m={m} "
                         "subspaces")
    ds = dim // m
    return [[[float(x) for x in r["v"][j * ds:(j + 1) * ds]] for r in rows]
            for j in range(m)]


def pq_encode(vec, books: list[list[list[float]]]) -> Column:
    """``array<int>`` of ``m`` code ids: per subspace, the L2-nearest code
    (first index wins exact ties — matches the oracle's (dist, code)
    ordering). Pure Column expr: m*k small folds, map-only, codegen'd."""
    m = len(books)
    ds = len(books[0][0])

    def l2sq(sub, code):
        lit = F.array(*[F.lit(x) for x in code])
        return F.aggregate(F.zip_with(sub, lit, lambda a, b: (a - b) * (a - b)),
                           F.lit(0.0), lambda acc, x: acc + x)

    codes = []
    for j in range(m):
        sub = F.slice(vec, j * ds + 1, ds)
        dists = F.array(*[l2sq(sub, c) for c in books[j]])
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
    return F.array(*codes)


def pq_reconstruct(codes, books: list[list[list[float]]]) -> Column:
    """Concatenation of each subspace's chosen code — the quantized vector
    the asymmetric-distance scoring dots the raw query against."""
    m = len(books)
    parts = []
    for j in range(m):
        book = F.array(*[F.array(*[F.lit(x) for x in c]) for c in books[j]])
        parts.append(F.element_at(book, F.element_at(codes, j + 1) + 1))
    return F.flatten(F.array(*parts))


def write_pq_index(corpus: DataFrame, books, id_col: str, vec_col: str,
                   path: str) -> None:
    """Persist (id, codes) — the 100 TB shape: with m=8 subspaces the
    stored index is 8 small ints per vector (~32 B vs 256 B for a float64
    x64 vector; 4 bits/code with k=16 after parquet dictionary+RLE), so
    the whole searchable index fits in a fraction of the corpus footprint
    and scoring scans never touch the raw embedding column."""
    (corpus.select(F.col(id_col),
                   pq_encode(F.col(vec_col).cast("array<double>"), books)
                   .alias("codes"))
     .write.mode("overwrite").parquet(path))


def _pq_cos(q_v, q_n, recon):
    """cos(query, reconstruction) with the reconstruction bound ONCE as a
    lambda variable — HOFs run interpreted (no CSE), so referencing the
    recon expression from both the dot and the norm would rebuild the
    64-float array twice per scored pair."""
    return F.aggregate(
        F.array(recon), F.lit(0.0),
        lambda _acc, r: dot(q_v, r) / (q_n * l2_norm(r)))


def pq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, k: int = 10, m: int = 8, n_codes: int = 16,
            books=None, codes_df: DataFrame | None = None) -> DataFrame:
    """Approximate top-k by product quantization with asymmetric distance:
    corpus vectors are replaced by their PQ reconstruction, queries stay
    raw, score = cos(query, reconstruction). Pass ``codes_df`` (from
    :func:`write_pq_index`) to score a PRE-ENCODED index — then the scan
    reads only the code column and the raw corpus is never touched.

    Scale: encoding is one map pass (or amortized into the index);
    scoring joins the broadcast query set against codes and runs one
    64-float fold per (query, vector) on the reconstruction — the shuffle
    after scoring carries only (query, id, score) and WindowGroupLimit
    keeps per-partition top-k before the exchange. Compose with the IVF
    partitionBy(centroid) layout for IVF-PQ: partition pruning picks the
    lists, codes make each list 8-32x smaller to scan.

    Returns (query_id, neighbor_id, rank) — rank 1..k per query.
    """
    if books is None:
        books = pq_codebooks(corpus, id_col, vec_col, m=m, k=n_codes)
    if codes_df is None:
        codes_df = corpus.select(
            F.col(id_col).alias("c_id"),
            pq_encode(F.col(vec_col).cast("array<double>"), books)
            .alias("codes"))
    else:
        codes_df = codes_df.select(F.col(id_col).alias("c_id"),
                                   "codes")
    q = _prep(queries, id_col, vec_col, "q")
    recon = pq_reconstruct(F.col("codes"), books)
    scored = (codes_df.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
              .select("q_id", "c_id",
                      _pq_cos(F.col("q_v"), F.col("q_n"), recon)
                      .alias("cos")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias("query_id"),
                    F.col("c_id").alias("neighbor_id"), "rank"))


def pq_codebooks_trained(corpus: DataFrame, id_col: str, vec_col: str,
                         m: int = 8, k: int = 16, iters: int = 3,
                         sample_fraction: float | None = None,
                         seed: int = 42) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means PQ codebooks (the trained counterpart
    of :func:`pq_codebooks`, same return shape). Each iteration is ONE map
    pass: encode with the current books (m argmin folds in-row), explode
    to (subspace, code, pos, x) partial sums, collect the m*k*ds codebook
    cells — driver data is bounded by the codebook, not the corpus. Train
    on a sample at scale (``sample_fraction``), exactly like
    kmeans_centroids. Deterministic: seeded sample + first-k init, empty
    cells keep their previous code."""
    c = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
    if sample_fraction is not None:
        c = c.sample(False, sample_fraction, seed=seed)
    c = c.persist()
    try:
        books = pq_codebooks(corpus, id_col, vec_col, m=m, k=k)
        ds = len(books[0][0])
        for _ in range(max(0, iters)):
            codes = pq_encode(F.col("v"), books)
            exp = c.select(F.posexplode(
                F.transform(codes, lambda cd, j: F.struct(
                    cd.alias("code"),
                    F.slice(F.col("v"), j * ds + 1, ds).alias("sub"))))
                .alias("j", "s"))
            stats = (exp.select("j", F.col("s.code").alias("code"),
                                F.posexplode(F.col("s.sub"))
                                .alias("pos", "x"))
                     .groupBy("j", "code", "pos")
                     .agg(F.sum("x").alias("sx"),
                          F.count(F.lit(1)).alias("n"))
                     .collect())
            cells: dict = {}
            for r in stats:
                cells.setdefault((int(r["j"]), int(r["code"])), {})[
                    int(r["pos"])] = r["sx"] / r["n"]
            books = [[
                [by_pos[p] for p in sorted(by_pos)]
                if (by_pos := cells.get((j, cd))) else books[j][cd]
                for cd in range(k)] for j in range(m)]
    finally:
        c.unpersist()
    return books


def write_ivfpq_index(corpus: DataFrame, centroids: DataFrame, books,
                      id_col: str, vec_col: str, path: str) -> None:
    """IVF-PQ index: the :func:`write_ivf_index` partitionBy(centroid)
    layout, but each row stores the PQ CODES instead of the raw vector —
    the production 100 TB ANN shape: partition pruning picks n_probe
    inverted lists, and each list is ~8 small ints per vector (32-64x
    smaller scan than raw float64x64), so a probe's IO is
    (n_probe/n_centroids) x (1/32) of the corpus."""
    c = _prep(corpus, id_col, vec_col, "c")
    cent = _prep(centroids, id_col, vec_col, "k")
    (_assign_centroids(c, cent)
     .select(F.col("c_id").alias(id_col),
             pq_encode(F.col("c_v"), books).alias("codes"), "centroid")
     .write.partitionBy("centroid").mode("overwrite").parquet(path))


def ivfpq_topk_from_index(spark, index_path: str, centroids: DataFrame,
                          books, queries: DataFrame, id_col: str,
                          vec_col: str, k: int = 10,
                          n_probe: int = 4) -> DataFrame:
    """Probe a persisted :func:`write_ivfpq_index` layout: centroid
    partition pruning + asymmetric-distance PQ scoring on the code
    column. Returns (query_id, neighbor_id, rank)."""
    cent = _prep(centroids, id_col, vec_col, "k")
    q = _prep(queries, id_col, vec_col, "q")
    probe_w = Window.partitionBy("q_id").orderBy(F.desc("aff"), F.asc("k_id"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("q_id", "q_v", "q_n", F.col("k_id"),
                (dot("q_v", "k_v") / (F.col("q_n") * F.col("k_n")))
                .alias("aff"))
        .withColumn("rnk", F.row_number().over(probe_w))
        .filter(F.col("rnk") <= n_probe)
        .select("q_id", "q_v", "q_n", F.col("k_id").alias("centroid")))
    wanted = [r[0] for r in probes.select("centroid").distinct().collect()]
    index = (spark.read.parquet(index_path)
             .filter(F.col("centroid").isin(wanted))
             .select(F.col(id_col).alias("c_id"), "codes", "centroid"))
    recon = pq_reconstruct(F.col("codes"), books)
    scored = (
        index.join(F.broadcast(probes), "centroid")
        .filter(F.col("c_id") != F.col("q_id"))
        .select(F.col("q_id").alias("query_id"),
                F.col("c_id").alias("neighbor_id"),
                _pq_cos(F.col("q_v"), F.col("q_n"), recon).alias("cos"))
        .distinct())
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
