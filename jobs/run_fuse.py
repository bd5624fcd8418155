"""spark-submit entrypoint: golden-record fusion of clustered entities.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_fuse.py \
        --input <records parquet> --clusters <(id, cluster_id) parquet> \
        --output <dir> --fields lang,path [--id-col record_id] \
        [--drop-singletons] [--weight-col <records double column>]

Completes the pipeline: run_match (pairs) -> run_closure (clusters) ->
run_fuse (one canonical row per entity).  The input is joined to the
assignment table on the id column, then operators/golden_record elects
the canonical value per (cluster, field) by majority vote with a
deterministic smallest-value tiebreak.

--drop-singletons filters out clusters with a single member before fusing
(a singleton "entity" is just its source record — skipping them saves the
melt for the usual long tail of unmatched rows).  The default fuses every
cluster, singletons included.

--weight-col names a double column on the joined frame (e.g. an
EM-calibrated edge strength propagated onto members): votes are then
weighted by it instead of counted, same deterministic tie-break
(golden_record weight_col semantics).

Scale: one hash join on the id column (broadcast if the assignment table
is small, AQE decides), the optional singleton filter is one map-side
combined groupBy on cluster_id + a semi-join, then the golden_record plan
— two shuffles for any number of fused fields, no windows.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="records parquet")
    p.add_argument(
        "--clusters", required=True, help="(id, cluster_id) assignment parquet"
    )
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="record_id")
    p.add_argument(
        "--fields",
        required=True,
        help="comma-separated record columns to fuse into the golden record",
    )
    p.add_argument(
        "--drop-singletons",
        action="store_true",
        help="skip clusters with a single member (fuse only true multi-"
        "record entities)",
    )
    p.add_argument(
        "--weight-col",
        default=None,
        help="double column on the joined records: weight votes by it "
        "instead of counting rows (golden_record weight_col)",
    )
    args = p.parse_args()

    from bigmatch_utilities_spark.operators.golden_record import golden_record

    spark = SparkSession.builder.appName("bigmatch-run-fuse").getOrCreate()
    records = spark.read.parquet(args.input)
    clusters = spark.read.parquet(args.clusters)
    fields = [f for f in args.fields.split(",") if f]
    joined = records.join(
        clusters.select(F.col("id").alias(args.id_col), "cluster_id"),
        args.id_col,
    )
    if args.drop_singletons:
        multi = (
            joined.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .select("cluster_id")
        )
        joined = joined.join(multi, "cluster_id", "left_semi")
    golden = golden_record(joined, "cluster_id", fields, weight_col=args.weight_col)
    golden.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
