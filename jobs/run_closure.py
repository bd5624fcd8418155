"""spark-submit entrypoint: transitive closure of accepted pairs.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_closure.py \
        --pairs <dir> --ids <dir> --output <dir> [--checkpoint-dir <dir>] \
        [--base <dir>]

--checkpoint-dir enables reliable (HDFS/object-store) checkpointing of each
large-star/small-star iteration; without it, localCheckpoint is used.

--base switches to INCREMENTAL mode: <dir> is the standing (id, cluster_id)
assignment parquet from a previous run, --pairs is the delta edge set only,
and the iterative closure runs on the contracted O(|delta|) label graph
instead of the full edge set (operators/cluster_audit.incremental_closure).
The output is the full updated assignment table — bit-identical to a batch
recompute over (old edges ∪ delta).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from bigmatch_utilities_spark.operators.closure import cluster_accepted_pairs


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", required=True, help="parquet of (id_rec, id_mem)")
    p.add_argument("--ids", default=None, help="optional parquet of all record ids")
    p.add_argument("--id-col", default="record_id")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--base",
        default=None,
        help="standing (id, cluster_id) parquet; incremental mode over delta --pairs",
    )
    args = p.parse_args()

    spark = SparkSession.builder.appName("bigmatch-run-closure").getOrCreate()
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    pairs = spark.read.parquet(args.pairs)
    if args.base:
        from bigmatch_utilities_spark.operators.cluster_audit import (
            incremental_closure,
        )

        base = spark.read.parquet(args.base)
        clusters = incremental_closure(base, pairs, src="id_rec", dst="id_mem")
    else:
        all_ids = spark.read.parquet(args.ids) if args.ids else None
        clusters = cluster_accepted_pairs(pairs, all_ids=all_ids, id_col=args.id_col)
    clusters.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
