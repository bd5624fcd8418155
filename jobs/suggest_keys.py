"""spark-submit entrypoint: pre-flight blocking-key design table.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/suggest_keys.py \
        --input <records parquet/iceberg> --keys "lang;lang,anchor_line;repo" \
        [--truth <(id_rec, id_mem) parquet>] [--id-col record_id] \
        [--output <parquet dir>]

Ranks candidate blocking-key sets BEFORE any pass runs: per key set the
block histogram, candidate-pair cost, and reduction ratio — plus pairs
completeness (recall) against a labeled truth sample when --truth is
given (operators/blocking.suggest_blocking_keys). --keys is
semicolon-separated key sets, each a comma-separated column list.

Without --output the table prints to stdout ordered by completeness desc
then cost asc (the decision view); with it, the same rows are written as
parquet for a plan-review artifact next to the run.

Scale: one map-side-combined groupBy per key set, truth broadcast once —
no pairs are ever materialized, so this is safe to run on the full
100-TB table as a plan review.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument(
        "--keys",
        required=True,
        help='semicolon-separated key sets, e.g. "lang;lang,anchor_line"',
    )
    p.add_argument("--truth", default=None, help="(id_rec, id_mem) parquet")
    p.add_argument("--id-col", default="record_id")
    p.add_argument("--output", default=None, help="write the table as parquet")
    args = p.parse_args()

    key_sets = [
        [c for c in ks.split(",") if c] for ks in args.keys.split(";") if ks
    ]

    from bigmatch_utilities_spark.operators.blocking import suggest_blocking_keys
    from bigmatch_utilities_spark.plans.tables import read_table

    spark = SparkSession.builder.appName("bigmatch-suggest-keys").getOrCreate()
    df = read_table(
        spark,
        args.input,
        fmt="iceberg" if "." in args.input and "/" not in args.input else "parquet",
    )
    truth = spark.read.parquet(args.truth) if args.truth else None
    table = suggest_blocking_keys(df, key_sets, truth, id_col=args.id_col)
    if args.truth:
        table = table.orderBy(
            ["pairs_completeness", "cand_pairs"], ascending=[False, True]
        )
    else:
        table = table.orderBy("cand_pairs")
    if args.output:
        table.write.mode("overwrite").parquet(args.output)
    else:
        table.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
