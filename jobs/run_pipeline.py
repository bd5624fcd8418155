"""spark-submit entrypoint: the COMPLETE linkage pipeline in one job —
match (multi-pass blocking + Fellegi-Sunter scoring) -> transitive closure
-> golden-record fusion.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_pipeline.py \
        --input <records parquet/iceberg> --output <dir> \
        [every jobs/run_match.py option: --checkpoint/--slices/--no-minhash/
         --max-block-rows/--shard-rows/--standardize/--decisions/
         --accept-threshold/--estimate-mu] \
        [--base <standing (id, cluster_id) parquet>] \
        [--repair-min-weight W [--repair-max-density D]] \
        [--fuse-fields lang,repo [--drop-singletons]] [--resume]

This is the reference's whole workflow (parmf match run -> review ->
dedupe/consolidate; reference/app/bigmatch.py drives them as separate GUI
steps) as a single submittable job. Outputs under --output:

    pairs/              per-pass scored pairs (partitioned by pass_id)
    good_pairs/         exact + above-threshold accepted pairs
    clusters/           (id, cluster_id) entity assignment
    clusters_repaired/  audit-gated over-merge splits (--repair-min-weight);
                        fusion reads this when present
    entities/           one canonical row per cluster (with --fuse-fields)
    mu_estimates/ ...   with --estimate-mu (see run_match.py)

--base switches the closure stage to INCREMENTAL mode: the standing
assignment table is updated with the new good_pairs on the contracted
O(|delta|) label graph (operators/cluster_audit.incremental_closure) —
the nightly "link today's records into the standing entity table" shape.

--resume is STAGE-level idempotence: a stage whose terminal output already
has a _SUCCESS marker is skipped (checked through the Hadoop FileSystem
API, so it works on HDFS/S3A object stores, not only local paths). It
composes with --checkpoint, which resumes WITHIN the match stage at
pass/slice granularity — kill the job anywhere and re-submit with the same
flags to continue. Skipping is only sound when --input and the match flags
are unchanged; the match stage's checkpoint sidecar already fails fast on
a slices mismatch (plans/checkpoint.py).

Scale: each stage reads the previous stage's materialized parquet rather
than re-deriving the DAG, so a 100-TB run gets a shuffle-free restart
boundary between stages and the closure/fusion stages see only the
(much smaller) pair/assignment tables, never the raw records except for
the one id-join in fusion.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _load_run_match():
    spec = importlib.util.spec_from_file_location(
        "run_match", os.path.join(os.path.dirname(os.path.abspath(__file__)), "run_match.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _has_success(spark: SparkSession, path: str) -> bool:
    """True when <path>/_SUCCESS exists — via the Hadoop FileSystem for the
    path's scheme, so object-store outputs resume the same as local ones."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def main() -> None:
    rm = _load_run_match()
    p = argparse.ArgumentParser()
    rm.add_match_args(p)
    p.add_argument(
        "--base",
        default=None,
        help="standing (id, cluster_id) parquet: run the closure stage "
        "incrementally over the new good_pairs delta (bit-identical to a "
        "batch recompute over old edges + delta)",
    )
    p.add_argument(
        "--fuse-fields",
        default=None,
        help="comma-separated record columns to fuse into one canonical row "
        "per cluster (golden-record stage; omitted = skip fusion)",
    )
    p.add_argument(
        "--drop-singletons",
        action="store_true",
        help="fusion only: skip single-member clusters",
    )
    p.add_argument(
        "--repair-min-weight",
        type=float,
        default=None,
        help="after closure, split over-merged clusters: inside clusters "
        "whose weakest edge is below this weight (and whose density is at "
        "most --repair-max-density), drop sub-threshold edges and re-run "
        "closure on the survivors (operators/cluster_audit.repair_clusters). "
        "Writes clusters_repaired/; fusion then uses the repaired assignment",
    )
    p.add_argument(
        "--repair-max-density",
        type=float,
        default=1.0,
        help="repair stage only: clusters denser than this are never split "
        "(a clique survives one weak edge; default 1.0 = all flagged)",
    )
    p.add_argument(
        "--resume",
        action="store_true",
        help="skip stages whose terminal output already has _SUCCESS "
        "(same --input and match flags required for soundness)",
    )
    p.add_argument(
        "--truth",
        default=None,
        help="labeled truth pairs parquet (id_rec, id_mem): also write "
        "<output>/metrics — pairwise precision/recall/F1 of good_pairs vs "
        "the sample (the north-rule F1, machine-checked in-job)",
    )
    args = p.parse_args()

    spark = SparkSession.builder.appName("bigmatch-run-pipeline").getOrCreate()
    out = args.output

    # ---- stage 1: match -> pairs/ + good_pairs/ --------------------------
    if args.resume and _has_success(spark, f"{out}/good_pairs"):
        print(f"[pipeline] match stage complete ({out}/good_pairs) — skipped")
    else:
        rm.match_stage(spark, args)

    # ---- stage 2: closure -> clusters/ -----------------------------------
    from bigmatch_utilities_spark.repo_linkage import ID_COL, with_record_id

    if args.resume and _has_success(spark, f"{out}/clusters"):
        print(f"[pipeline] closure stage complete ({out}/clusters) — skipped")
    else:
        good = spark.read.parquet(f"{out}/good_pairs")
        if args.base:
            from bigmatch_utilities_spark.operators.cluster_audit import (
                incremental_closure,
            )

            clusters = incremental_closure(
                spark.read.parquet(args.base), good, src="id_rec", dst="id_mem"
            )
        else:
            from bigmatch_utilities_spark.operators.closure import (
                cluster_accepted_pairs,
            )
            from bigmatch_utilities_spark.plans.tables import read_table

            records = read_table(
                spark,
                args.input,
                fmt="iceberg"
                if "." in args.input and "/" not in args.input
                else "parquet",
            )
            all_ids = with_record_id(records).select(ID_COL)
            clusters = cluster_accepted_pairs(good, all_ids=all_ids, id_col=ID_COL)
        clusters.write.mode("overwrite").parquet(f"{out}/clusters")

    # ---- optional: cluster repair -> clusters_repaired/ --------------------
    clusters_dir = f"{out}/clusters"
    if args.repair_min_weight is not None:
        clusters_dir = f"{out}/clusters_repaired"
        if args.resume and _has_success(spark, clusters_dir):
            print(f"[pipeline] repair stage complete ({clusters_dir}) — skipped")
        else:
            from bigmatch_utilities_spark.operators.cluster_audit import (
                repair_clusters,
            )

            repair_clusters(
                spark.read.parquet(f"{out}/clusters"),
                spark.read.parquet(f"{out}/good_pairs"),
                min_weight=args.repair_min_weight,
                max_density=args.repair_max_density,
                id_l="id_rec",
                id_r="id_mem",
            ).write.mode("overwrite").parquet(clusters_dir)

    # ---- optional: pairwise evaluation -> metrics/ + cutoff_sweep/ --------
    if args.truth and not (args.resume and _has_success(spark, f"{out}/metrics")):
        from bigmatch_utilities_spark.operators.evaluate import (
            cutoff_sweep,
            pairwise_metrics,
        )

        truth = spark.read.parquet(args.truth)
        pairwise_metrics(
            spark.read.parquet(f"{out}/good_pairs"),
            truth,
            id_l="id_rec",
            id_r="id_mem",
        ).write.mode("overwrite").parquet(f"{out}/metrics")
        # the operating curve the analyst picks the accept cutoff from:
        # P/R/F1 at a weight grid over ALL scored pairs (pairs/ keeps the
        # below-cutoff rows), one extra pass
        cutoff_sweep(
            spark.read.parquet(f"{out}/pairs"),
            truth,
            thresholds=[-8.0, -6.0, -4.0, -2.0, -1.0, 0.0, 1.0, 2.0, 4.0, 8.0],
            id_l="id_rec",
            id_r="id_mem",
        ).write.mode("overwrite").parquet(f"{out}/cutoff_sweep")

    # ---- stage 3: golden-record fusion -> entities/ ----------------------
    if not args.fuse_fields:
        spark.stop()
        return
    if args.resume and _has_success(spark, f"{out}/entities"):
        print(f"[pipeline] fuse stage complete ({out}/entities) — skipped")
        spark.stop()
        return

    from bigmatch_utilities_spark.operators.golden_record import golden_record
    from bigmatch_utilities_spark.plans.tables import read_table

    fields = [f for f in args.fuse_fields.split(",") if f]
    records = read_table(
        spark,
        args.input,
        fmt="iceberg" if "." in args.input and "/" not in args.input else "parquet",
    )
    joined = with_record_id(records).join(
        spark.read.parquet(clusters_dir).select(
            F.col("id").alias(ID_COL), "cluster_id"
        ),
        ID_COL,
    )
    if args.drop_singletons:
        multi = (
            joined.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .select("cluster_id")
        )
        joined = joined.join(multi, "cluster_id", "left_semi")
    golden_record(joined, "cluster_id", fields).write.mode("overwrite").parquet(
        f"{out}/entities"
    )
    spark.stop()


if __name__ == "__main__":
    main()
