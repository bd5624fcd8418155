"""Transitive closure of accepted pairs → entity clusters.

The reference stops at accepted pairs (manual review + the `cleanpairs`
shell key file, /root/reference/cleanpairs:29-44); entity formation is
completed here as connected components via the large-star / small-star
alternation (Kiveris et al. 2014, "Connected Components in MapReduce and
Beyond") — an iterative hash-join label propagation that converges in
O(log^2 n) rounds and keeps every step a plain shuffle-on-node-id
DataFrame aggregation, so it scales to 10^12-edge graphs:

  large-star: for each node u, attach m = min(N(u) ∪ {u}); re-point every
              strictly-larger neighbor at m.
  small-star: orient edges toward the smaller endpoint; for each node u,
              re-point u and all its (smaller) neighbors at the minimum.

Each iteration `localCheckpoint`s (or reliable-checkpoints when a
checkpoint dir is set) to truncate lineage — without this the plan doubles
per round and the driver OOMs long before the data does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (src > dst), no self-loops, distinct."""
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    return e.filter(F.col("src") != F.col("dst")).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    both = edges.unionAll(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    neigh_min = both.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        both.join(neigh_min, on="src")
        .withColumn("m", F.least(F.col("src"), F.col("mn")))
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    neigh_min = e.groupBy("src").agg(F.min("dst").alias("m"))
    repointed = (
        e.join(neigh_min, on="src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = neigh_min.select(F.col("src"), F.col("m").alias("dst"))
    return (
        repointed.unionAll(self_edge)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
    )


def _truncate(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _signature(e: DataFrame) -> tuple[int, int]:
    """Order-insensitive identity of a distinct edge set: (count, sum of
    64-bit row hashes). One cheap scan per iteration, vs. the two
    anti-join jobs a symmetric exceptAll convergence test costs.
    decimal(38,0) accumulator: ANSI mode (Spark 4 default) would throw on
    long overflow, and 2^63-magnitude hash sums overflow immediately."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    verify_convergence: bool = True,
) -> DataFrame:
    """Edges → (id, cluster_id) where cluster_id = min member id.

    Isolated nodes don't appear (callers union them back with
    cluster_id = own id if needed)."""
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = _truncate(e)
    sig = _signature(e)
    for _ in range(max_iterations):
        prev = e
        e2 = _truncate(_small_star(_large_star(e)))
        # convergence: identical canonical+distinct edge sets ⇔ identical
        # (count, hash-sum) signatures (collision odds ~2^-64 per run).
        # When signatures first match, verify_convergence runs ONE exact
        # exceptAll check over the two (already materialized, checkpointed)
        # frames — a hash collision then costs one extra iteration instead
        # of silently wrong clusters, and the exact check runs once per
        # call, not once per round. One-sided exceptAll suffices: both
        # sets are distinct and the matched signature pins equal counts.
        sig2 = _signature(e2)
        e = e2
        if sig2 == sig:
            if verify_convergence and prev.exceptAll(e2).limit(1).count() > 0:
                sig = sig2
                continue
            break
        sig = sig2
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iterations} rounds")

    # At fixpoint every edge points a node at its component minimum.
    members = e.select(F.col("src").alias("id"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("id"), F.col("dst").alias("cluster_id"))
    return members.unionAll(roots).groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))


def cluster_accepted_pairs(
    good_pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "id",
) -> DataFrame:
    """(id_rec, id_mem) accepted pairs → (id, cluster_id); optionally union
    singletons from `all_ids` so every record receives a cluster."""
    comps = connected_components(good_pairs, src="id_rec", dst="id_mem")
    if all_ids is None:
        return comps
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(comps, on="id", how="left")
        .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
    )
