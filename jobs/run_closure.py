"""spark-submit entrypoint: transitive closure of accepted pairs.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_closure.py \
        --pairs <dir> --ids <dir> --output <dir> [--checkpoint-dir <dir>]

--checkpoint-dir enables reliable (HDFS/object-store) checkpointing of each
large-star/small-star iteration; without it, localCheckpoint is used.
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
    args = p.parse_args()

    spark = SparkSession.builder.appName("bigmatch-run-closure").getOrCreate()
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    pairs = spark.read.parquet(args.pairs)
    all_ids = spark.read.parquet(args.ids) if args.ids else None
    clusters = cluster_accepted_pairs(pairs, all_ids=all_ids, id_col=args.id_col)
    clusters.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
