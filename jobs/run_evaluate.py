"""spark-submit entrypoint: linkage evaluation against a labeled truth set.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_evaluate.py \
        --pairs <scored pairs parquet> --truth <(id_l, id_r) parquet> \
        --output <dir> [--weight-col weight] [--threshold 0.0] \
        [--strata <(id, stratum) parquet>] \
        [--clusters <(id, cluster_id) parquet> --labels <(id, label) parquet>] \
        [--sweep t1,t2,...] [--posterior-col posterior --bins 10]

Completes the pipeline's audit leg: given the pairs run_match emitted and
a labeled truth sample, write every evaluation surface the engine has as
parquet under --output and a one-line summary to stats.json:

  pairwise/      pairwise precision/recall/F1 at --threshold
                 (operators/evaluate.pairwise_metrics)
  stratified/    the same counters per record stratum, when --strata is
                 given (stratified_metrics — the linkage-equity audit)
  sweep/         the full operating curve, when --sweep lists thresholds
                 (cutoff_sweep: one pass, every cutoff)
  clusters/      B-cubed + ARI, when --clusters/--labels are given
                 (cluster_metrics)
  churn/         run-over-run cluster churn (new/merged/stable/split/
                 grown/reshaped per current cluster), when
                 --clusters-prev is also given (entity_ids.cluster_churn)
  triangles/     per-cluster triangle census with --triangles and
                 --clusters: transitivity near 0 flags chain-shaped
                 clusters for repair (cluster_audit.cluster_triangles);
                 stats.json counts them as triangles_chain_shaped
  calibration/   reliability diagram + per-bin Brier, when the pairs
                 carry --posterior-col (posterior_calibration)

The reference has NO evaluation tooling — decisions are eyeballed in the
MatchReview pane (/root/reference/app/MatchReview.py:26); this job makes
the audit a single spark-submit step.

Scale: every surface is one or two pair-key shuffles over the pairs file
(each operator's own scale notes apply); the truth sample is typically
small and broadcastable. Surfaces are independent — a missing optional
input skips its output rather than failing the job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", required=True, help="scored pairs parquet")
    p.add_argument("--truth", required=True, help="(id_l, id_r) truth parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--id-l", default="id_rec", help="pair id columns on --pairs")
    p.add_argument("--id-r", default="id_mem")
    p.add_argument("--truth-id-l", default="id_l", help="pair id columns on --truth")
    p.add_argument("--truth-id-r", default="id_r")
    p.add_argument("--weight-col", default="weight")
    p.add_argument(
        "--threshold",
        type=float,
        default=0.0,
        help="accept cutoff for the headline pairwise metrics",
    )
    p.add_argument(
        "--strata",
        default=None,
        help="(id, stratum) parquet: also write per-subgroup metrics",
    )
    p.add_argument(
        "--clusters",
        default=None,
        help="(id, cluster_id) parquet: also write B-cubed/ARI vs --labels",
    )
    p.add_argument(
        "--labels", default=None, help="(id, label) truth entities parquet"
    )
    p.add_argument(
        "--clusters-prev",
        default=None,
        help="(id, cluster_id) parquet of the PREVIOUS run: also write the "
        "run-over-run churn report (new/merged/stable/split/grown/reshaped)",
    )
    p.add_argument(
        "--triangles",
        action="store_true",
        help="with --clusters: write the per-cluster triangle census over "
        "the accepted pairs (chain-vs-clique shape diagnostic)",
    )
    p.add_argument(
        "--sweep",
        default=None,
        help="comma-separated thresholds: also write the operating curve",
    )
    p.add_argument(
        "--posterior-col",
        default=None,
        help="posterior probability column on the pairs: also write the "
        "calibration table",
    )
    p.add_argument("--bins", type=int, default=10)
    args = p.parse_args()

    from bigmatch_utilities_spark.operators.evaluate import (
        cluster_metrics,
        cutoff_sweep,
        pairwise_metrics,
        posterior_calibration,
        stratified_metrics,
    )

    spark = SparkSession.builder.appName("bigmatch-run-evaluate").getOrCreate()
    # normalize both pair frames to (id_l, id_r) so every surface below
    # shares one naming convention regardless of the inputs' own names
    pairs = spark.read.parquet(args.pairs).withColumnsRenamed(
        {args.id_l: "id_l", args.id_r: "id_r"}
    )
    truth = spark.read.parquet(args.truth).withColumnsRenamed(
        {args.truth_id_l: "id_l", args.truth_id_r: "id_r"}
    )
    stats: dict = {}

    pred = pairs.filter(
        F.col(args.weight_col) >= F.lit(args.threshold)
    ).select("id_l", "id_r")
    pm = pairwise_metrics(pred, truth)
    pm.write.mode("overwrite").parquet(os.path.join(args.output, "pairwise"))
    row = pm.collect()[0]
    stats["pairwise"] = {k: row[k] for k in row.asDict()}

    if args.strata:
        strata = spark.read.parquet(args.strata)
        sm = stratified_metrics(pred, truth, strata)
        sm.write.mode("overwrite").parquet(
            os.path.join(args.output, "stratified")
        )
        stats["strata_rows"] = sm.count()

    if args.sweep:
        ths = [float(x) for x in args.sweep.split(",") if x]
        sw = cutoff_sweep(pairs, truth, ths, weight_col=args.weight_col)
        sw.write.mode("overwrite").parquet(os.path.join(args.output, "sweep"))
        stats["sweep_thresholds"] = len(ths)

    if args.clusters and args.labels:
        cm = cluster_metrics(
            spark.read.parquet(args.clusters),
            spark.read.parquet(args.labels),
        )
        cm.write.mode("overwrite").parquet(
            os.path.join(args.output, "clusters")
        )
        crow = cm.collect()[0]
        stats["clusters"] = {k: crow[k] for k in crow.asDict()}

    if args.clusters and args.clusters_prev:
        from bigmatch_utilities_spark.operators.entity_ids import cluster_churn

        churn = cluster_churn(
            spark.read.parquet(args.clusters).select(
                F.col("id"), F.col("cluster_id").alias("cluster")
            ),
            spark.read.parquet(args.clusters_prev).select(
                F.col("id"), F.col("cluster_id").alias("entity_id")
            ),
        )
        churn.write.mode("overwrite").parquet(
            os.path.join(args.output, "churn")
        )
        for r in churn.groupBy("category").count().collect():
            stats[f"churn_{r['category']}"] = r["count"]

    if args.triangles and args.clusters:
        from bigmatch_utilities_spark.operators.cluster_audit import (
            cluster_triangles,
        )

        tri = cluster_triangles(spark.read.parquet(args.clusters), pred)
        tri.write.mode("overwrite").parquet(
            os.path.join(args.output, "triangles")
        )
        stats["triangles_clusters"] = tri.count()
        stats["triangles_chain_shaped"] = tri.filter(
            F.col("n_triangles") == 0
        ).count()

    if args.posterior_col:
        cal = posterior_calibration(
            pairs, truth, n_bins=args.bins, posterior_col=args.posterior_col
        )
        cal.write.mode("overwrite").parquet(
            os.path.join(args.output, "calibration")
        )
        stats["calibration_bins"] = cal.count()

    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "stats.json"), "w") as fh:
        json.dump(stats, fh, indent=2, sort_keys=True, default=str)
    print(json.dumps(stats, sort_keys=True, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
