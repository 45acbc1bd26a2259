"""Duplicate-group clustering: connected components over candidate pairs.

Near-dup detection (MinHash/SimHash/embedding LSH) emits PAIRS; acting on
them — keep one document per duplicate *cluster* — needs the transitive
closure. This implements the alternating large-star / small-star
connected-components algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14): O(log^2 n) rounds, every round a
map + shuffle-on-node-id, no driver-side graph state.

Scale design:

* Each round derives per-node minima via groupBy (map-side-combined
  partial min) joined back — never a window aggregate or a
  collect_list of neighbor sets, so a hub node's neighborhood never
  materializes in one task's memory and the minimum genuinely folds
  map-side.
* Iteration state is checkpointed (localCheckpoint by default; reliable
  checkpoint when ``sc.setCheckpointDir`` is configured — the cluster
  setting, since localCheckpoint blocks die with their executor) so the
  lineage (and thus planning time) stays O(1) per round instead of
  O(rounds).
* Convergence is detected from ONE bounded aggregate per round (the
  direct star-forest fixpoint test), never by collecting edges and never
  by paying an extra round to watch the set stop changing.

The reference engine has no dedup-clustering surface; this extends it per
the north-star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["duplicate_groups", "dedup_by_groups"]


def _canon(edges: DataFrame) -> DataFrame:
    """Orient every undirected edge as (hi > lo), dropping self-loops."""
    hi = F.greatest("hi", "lo")
    lo = F.least("hi", "lo")
    return (edges.select(hi.alias("hi"), lo.alias("lo"))
            .filter(F.col("hi") != F.col("lo")).distinct())


def _ckpt(df: DataFrame) -> DataFrame:
    """Truncate lineage on the iteration state. ``localCheckpoint`` by
    default (blocks in executor storage — cheap, but an executor loss
    mid-fold fails the job since lineage is gone); when the session has a
    reliable checkpoint dir configured (``sc.setCheckpointDir`` — the
    cluster-scale setting), use ``checkpoint`` so blocks live on the
    cluster FS and survive executor loss."""
    sc = df.sparkSession.sparkContext
    try:
        reliable = sc.getCheckpointDir() is not None
    except Exception:
        reliable = False
    return df.checkpoint(eager=True) if reliable \
        else df.localCheckpoint(eager=True)


def _is_star_forest(edges: DataFrame) -> bool:
    """True iff the (hi > lo)-oriented edge set is a star forest: every
    ``hi`` (member) has exactly one ``lo`` (root) and no node appears as
    both member and root. Under the orientation invariant every root is
    then its star's minimum, which makes a star forest exactly the
    algorithm's fixpoint — large-star and small-star both map it to
    itself — so the fold can stop the moment this holds instead of
    paying one more full round to observe set-equality. One bounded
    aggregation (map-side combined) over the checkpointed edge set;
    never a collect of edges."""
    nodes = edges.select(F.col("hi").alias("n"),
                         F.lit(1).alias("h"), F.lit(0).alias("l")) \
        .union(edges.select("lo", F.lit(0), F.lit(1)))
    viol = (nodes.groupBy("n")
            .agg(F.sum("h").alias("nh"), F.sum("l").alias("nl"))
            .filter((F.col("nh") > 1)
                    | ((F.col("nh") > 0) & (F.col("nl") > 0))))
    return viol.isEmpty()


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(N(u) ∪ {u}).

    The per-node minimum is a groupBy (map-side-combined partial min)
    joined back, NOT a window aggregate: a window shuffles a hub node's
    ENTIRE neighborhood into one task before aggregating (no partial
    fold), which is exactly the skew a boilerplate dup-cluster of
    millions creates; the groupBy folds map-side and the join-back
    streams the hub through a hash probe (AQE skew-split applies)."""
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("__mv"))
    return (sym.join(mins, "u")
            .withColumn("m", F.least(F.col("__mv"), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo")).distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Rewire every strictly-smaller neighborhood to its minimum (same
    groupBy-not-window shape as _large_star, same skew rationale)."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    with_m = edges.join(mins, "hi")
    rewired = (with_m.filter(F.col("lo") != F.col("m"))
               .select(F.col("lo").alias("hi"), F.col("m").alias("lo")))
    anchor = with_m.select("hi", F.col("m").alias("lo"))
    return rewired.union(anchor).distinct()


def duplicate_groups(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Resolve candidate duplicate pairs into components.

    Returns ``(id, group_id)`` — one row per node appearing in ``pairs``,
    where ``group_id`` is the smallest id in the node's connected
    component (the canonical representative, itself included).
    """
    edges = _canon(pairs.select(F.col(id_a).alias("hi"),
                                F.col(id_b).alias("lo")))
    # checkpoint, not persist: the pair source's lineage (an LSH
    # signature pass — thousands of md5 expression nodes) would otherwise
    # sit under the cache node and be RE-OPTIMIZED by Catalyst on every
    # round's action; measured at sf0.1 the first star round paid ~6 s of
    # driver-side planning against a persisted edge set vs ~1 s against a
    # checkpointed one. The truncation also keeps every round's plan O(1)
    # regardless of how deep the caller's pair derivation is.
    # (Blocks are freed by the ContextCleaner when a round's frame is
    # dropped — DataFrame.unpersist is a no-op on checkpointed frames.)
    edges = _ckpt(edges)
    # Fixpoint detection is the direct star-forest test (r16): a star
    # forest is a fixpoint (both stars map it to itself), so the old
    # count + subtract equality check — which paid one extra full round
    # of plan + checkpoint to SEE the set stop changing — is replaced by
    # one bounded aggregation per round on the current edge set. LSH dup
    # graphs converge in 1-2 rounds (exact-dup inputs arrive as stars
    # and take zero), so this saves the most expensive round, the
    # redundant confirming one. A non-forest fixpoint would spin to
    # max_iter and return the same set the equality check would have —
    # identical output, and Kiveris et al.'s convergence argument rules
    # the case out anyway.
    for _ in range(max_iter):
        if _is_star_forest(edges):
            break
        edges = _ckpt(_small_star(_large_star(edges)))
    # at the fixpoint the edge set is a star forest: (member, root)
    members = edges.groupBy("hi").agg(F.min("lo").alias("group_id")).select(
        F.col("hi").alias("id"), "group_id")
    roots = (edges.select(F.col("lo").alias("id")).distinct()
             .join(members.select(F.col("id")), "id", "left_anti")
             .withColumn("group_id", F.col("id")))
    return members.unionByName(roots)


def dedup_by_groups(df: DataFrame, id_col: str, pairs: DataFrame,
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Keep one representative row (the component-min id) per duplicate
    cluster; rows never named in ``pairs`` pass through untouched."""
    losers = (duplicate_groups(pairs, id_a, id_b)
              .filter(F.col("id") != F.col("group_id"))
              .select(F.col("id").alias(id_col)))
    return df.join(losers, id_col, "left_anti")
