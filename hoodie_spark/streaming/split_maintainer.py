"""Leakage-safe train/val/test assignment as maintained streaming state.

The batch operator (:func:`~hoodie_spark.functions.pipeline.
leakage_safe_split`) assigns every near-duplicate component to ONE split.
On a continuously-ingested corpus the same guarantee has to hold ACROSS
batches: a paraphrase of a doc that already landed in eval must inherit
eval, not be re-hashed into train. This maintainer keeps per-doc dedup
features (the compact :func:`~hoodie_spark.functions.dedup.doc_features`
row: content hash + MinHash band signatures — a few hundred bytes per
doc) together with each doc's component ROOT, and assigns arriving docs
by root inheritance:

* in-batch duplicate edges (exact chash match, or LSH band match with
  signature agreement ≥ ``min_sig_matches(threshold, num_hashes)``)
  resolve to components (the large-star/small-star fold);
* every component inherits the SMALLEST root among (its members' ids,
  any state roots its members matched) — so a doc matching something
  seen three batches ago lands in that doc's split;
* ``split = hash(root)`` against the 65536-grain cuts, identical to the
  batch operator's plane.

Exactness contract: for id-ordered arrival where later batches add no
NEW connectivity between earlier components (exact copies never do —
a byte-identical copy has its original's signature, hence exactly its
original's edges), the streaming assignment is BIT-IDENTICAL to the
batch operator's sig-agreement-gated components over the union
(oracle-verified). The online limitation is the late BRIDGE: a doc
whose matches span two ALREADY-ASSIGNED components inherits the
smallest root, but the other component's earlier assignment stands —
no retroactive reassignment (test-pinned; rebuild() re-derives all
assignments from the table if a batch-exact state is required after
heavy mutation).

Crash safety mirrors the sibling maintainers: features+assignments
append first, the watermark publishes last with one atomic PUT;
a replayed batch re-derives the same roots (matching its own persisted
features yields its own root — idempotent), and the watermark gates
catch_up replays. Single-maintainer by contract — folds run inside the
maintainer lock (maintainer.py).

Scale shape (100 TB): per batch — one feature pass over the batch, two
bucket-pruned equi-joins against state (batch side broadcast-small),
one bounded in-batch self-join (the hot-group-guarded
bounded_self_pairs), the O(log² c)-round component fold over the
batch's OWN edges only, and appends. Never a corpus scan; state grows
one feature row per doc and is bucket-partitioned on disk exactly like
IncrementalDeduper's.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.components import duplicate_groups
from ..functions.dedup import (bounded_self_pairs, doc_features,
                               min_sig_matches, sig_agreement)
from ..functions.pipeline import sample_hash
from .maintainer import locked_fold

__all__ = ["SplitMaintainer"]


class SplitMaintainer:
    """Maintained leakage-safe split assignment for a table's documents."""

    def __init__(self, table, state_path: str, id_col: str, text_col: str,
                 splits: dict[str, float] | None = None,
                 threshold: float = 0.8, num_hashes: int = 16,
                 bands: int = 4, ngram: int = 5, n_buckets: int = 32):
        self.table = table
        self.path = state_path
        self.id_col = id_col
        self.text_col = text_col
        self.splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
        if not self.splits or abs(sum(self.splits.values()) - 1.0) > 1e-6:
            raise ValueError("split fractions must sum to 1")
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.ngram = ngram
        self.n_buckets = n_buckets
        self.fs = table.storage
        self._lock_dir = state_path  # single-maintainer fence
        st = self._load()
        if st:
            for k in ("threshold", "num_hashes", "bands", "ngram",
                      "n_buckets"):
                if st[k] != getattr(self, k):
                    raise ValueError(
                        f"split state at {self.path} was built with "
                        f"{k}={st[k]}, got {getattr(self, k)}")
            if st["splits"] != self.splits:
                raise ValueError(
                    f"split state at {self.path} was built with "
                    f"splits={st['splits']} — fractions are part of the "
                    "assignment and cannot change mid-corpus")

    # ----------------------------------------------------------- state io
    @property
    def _state_file(self) -> str:
        return os.path.join(self.path, "state.json")

    def _load(self) -> dict | None:
        raw = self.fs.read_bytes(self._state_file)
        return None if raw is None else json.loads(raw)

    def _publish(self, instant: str | None) -> None:
        from .. import storage

        self.fs.makedirs(self.path)
        storage.ATOMIC.put_atomic(self._state_file, json.dumps({
            "instant": instant, "threshold": self.threshold,
            "num_hashes": self.num_hashes, "bands": self.bands,
            "ngram": self.ngram, "n_buckets": self.n_buckets,
            "splits": self.splits}).encode())

    def _read(self, sub: str, schema: str) -> DataFrame:
        p = os.path.join(self.path, sub)
        spark = self.table.spark
        if not self.fs.exists(p) or not self.fs.listdir(p):
            return spark.createDataFrame([], f"bucket int, {schema}")
        return spark.read.schema(f"bucket int, {schema}").parquet(p)

    # ------------------------------------------------------------- split
    def _split_expr(self, root_col):
        h = sample_hash(root_col) % 65536
        names = list(self.splits)
        cum, cuts = 0.0, []
        for name in names[:-1]:
            cum += self.splits[name]
            cuts.append(int(round(cum * 65536)))
        expr = F.lit(names[-1])
        for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
            expr = F.when(h < cut, F.lit(name)).otherwise(expr)
        return expr

    # ------------------------------------------------------------ assign
    def _assign(self, df: DataFrame) -> DataFrame:
        """(df.*, __root, split) — pure derivation, no state mutation."""
        id_col = self.id_col
        mm = min_sig_matches(self.threshold, self.num_hashes)
        feats = doc_features(df, id_col, self.text_col,
                             self.num_hashes, self.bands,
                             self.ngram).persist()
        banded = feats.select(
            id_col, "minhash", F.explode_outer("bands").alias("bk")) \
            .select(id_col, "minhash",
                    F.col("bk.band").alias("band"),
                    F.col("bk.bh").alias("bh"))

        # --- state matches → per-doc smallest matched root
        content = self._read("content", "chash string, root long")
        exact_state = (feats
                       .withColumn("bucket",
                                   F.pmod(F.xxhash64("chash"),
                                          F.lit(self.n_buckets)).cast("int"))
                       .join(content, ["bucket", "chash"])
                       .select(id_col, "root"))
        sbands = self._read(
            "bands", "band int, bh string, minhash array<string>, "
            "root long")
        near_state = (banded.filter(F.col("bh").isNotNull())
                      .withColumn("bucket",
                                  F.pmod(F.xxhash64("bh"),
                                         F.lit(self.n_buckets)).cast("int"))
                      .join(sbands.select("bucket", "band", "bh",
                                          F.col("minhash").alias("__ss"),
                                          "root"),
                            ["bucket", "band", "bh"])
                      .filter(sig_agreement(F.col("minhash"),
                                            F.col("__ss")) >= mm)
                      .select(id_col, "root"))
        state_root = (exact_state.unionByName(near_state)
                      .groupBy(id_col)
                      .agg(F.min("root").alias("__sroot")))

        # --- in-batch duplicate edges → components
        w = Window.partitionBy("chash").orderBy(id_col)
        exact_pairs = (feats.filter(F.col("chash").isNotNull())
                       .withColumn("__first",
                                   F.first(id_col).over(w))
                       .filter(F.col("__first") != F.col(id_col))
                       .select(F.col("__first").alias("id_a"),
                               F.col(id_col).alias("id_b")))
        near_pairs = (bounded_self_pairs(
            banded.filter(F.col("bh").isNotNull()),
            ["band", "bh"], id_col, None, carry=("minhash",))
            .filter(sig_agreement(F.col("minhash_a"),
                                  F.col("minhash_b")) >= mm)
            .select("id_a", "id_b"))
        comp = duplicate_groups(exact_pairs.unionByName(near_pairs)) \
            .select(F.col("id").alias("__cid"),
                    F.col("group_id").alias("__comp"))

        # --- component root = min(member ids, members' state roots)
        member = (feats.select(id_col)
                  .join(comp, feats[self.id_col] == F.col("__cid"), "left")
                  .drop("__cid")
                  .withColumn("__comp", F.coalesce(F.col("__comp"),
                                                   F.col(id_col)))
                  .join(state_root, id_col, "left"))
        comp_root = (member.groupBy("__comp")
                     .agg(F.min(F.least(F.col("__sroot"), F.col(id_col)))
                          .alias("__root")))
        roots = (member.select(id_col, "__comp")
                 .join(comp_root, "__comp").drop("__comp"))
        out = (df.join(roots, id_col)
               .withColumn("split", self._split_expr(F.col("__root"))))
        feats.unpersist()
        return out

    @locked_fold
    def assign_and_register(self, df: DataFrame,
                            instant: str | None = None) -> DataFrame:
        """Assign splits to a batch AND persist its features+roots as
        state; returns (df.*, __root, split). The returned frame is
        computed once (collected into the state write) — reading it
        again is cheap."""
        assigned = self._assign(df).persist()
        feats = doc_features(assigned, self.id_col, self.text_col,
                             self.num_hashes, self.bands, self.ngram) \
            .join(assigned.select(self.id_col,
                                  F.col("__root").alias("root")),
                  self.id_col)
        self.fs.makedirs(self.path)
        (feats.filter(F.col("chash").isNotNull())
         .select(F.pmod(F.xxhash64("chash"),
                        F.lit(self.n_buckets)).cast("int").alias("bucket"),
                 "chash", "root")
         .write.partitionBy("bucket").mode("append")
         .parquet(os.path.join(self.path, "content")))
        (feats.filter(F.col("minhash").isNotNull())
         .select(self.id_col, "minhash", "root",
                 F.explode("bands").alias("bk"))
         .select(F.pmod(F.xxhash64("bk.bh"),
                        F.lit(self.n_buckets)).cast("int").alias("bucket"),
                 F.col("bk.band").alias("band"),
                 F.col("bk.bh").alias("bh"), "minhash", "root")
         .write.partitionBy("bucket").mode("append")
         .parquet(os.path.join(self.path, "bands")))
        (assigned.select(self.id_col, F.col("__root").alias("root"),
                         "split")
         .write.mode("append")
         .parquet(os.path.join(self.path, "assignments")))
        self._publish(instant if instant is not None
                      else (self._load() or {}).get("instant"))
        assigned.unpersist()
        return assigned

    # ----------------------------------------------------------- catch-up
    @locked_fold
    def catch_up(self) -> int:
        """Assign+register every table row that arrived since the
        watermark (crash repair / pre-existing table adoption)."""
        st = self._load()
        mark = st["instant"] if st else None
        if mark is not None:
            from .. import timeline as tl

            undone = [i for i in self.table.timeline.completed(
                          (tl.ROLLBACK, tl.RESTORE))
                      if i.timestamp > mark]
            if undone:
                return self.rebuild()
        last = self.table.timeline.last_completed()
        if last is None or (mark is not None and last.timestamp <= mark):
            if st is None:
                self._publish(None)
            return 0
        delta = self.table.incremental(begin=mark, end=last.timestamp) \
            .select(self.id_col, self.text_col)
        n = delta.count()
        if n:
            # replay-safe: docs already in state match their own persisted
            # features and inherit their own root
            self.assign_and_register(delta, instant=last.timestamp)
        else:
            self._publish(last.timestamp)
        return n

    @locked_fold
    def rebuild(self) -> int:
        """Drop state and re-derive every assignment from the table's
        current content as ONE batch (exact batch semantics). Used after
        rollback/restore; NOTE assignments can change — rebuilding is an
        operator decision, not routine maintenance."""
        last = self.table.timeline.last_completed()
        for sub in ("content", "bands", "assignments"):
            self.fs.rmtree(os.path.join(self.path, sub))
        snap = self.table.snapshot(
            as_of=last.timestamp if last else None) \
            .select(self.id_col, self.text_col)
        if last is None:
            self._publish(None)
            return 0
        self.assign_and_register(snap, instant=last.timestamp)
        return snap.count()

    # ---------------------------------------------------------- analytics
    def assignments(self) -> DataFrame:
        """All persisted (id, root, split) rows. Distinct: a crash-replay
        of a batch re-appends byte-identical rows (replay idempotence),
        so duplicates carry no information."""
        p = os.path.join(self.path, "assignments")
        spark = self.table.spark
        if not self.fs.exists(p) or not self.fs.listdir(p):
            return spark.createDataFrame(
                [], f"{self.id_col} long, root long, split string")
        return spark.read.parquet(p).distinct()

    def on_commit(self, batch: DataFrame | None = None,
                  result=None) -> int:
        """Ingestor post-commit hook."""
        return self.catch_up()
