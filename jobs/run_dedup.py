"""spark-submit entrypoint: large-scale text deduplication.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_dedup.py \
        --input <parquet-or-table> --output <dir> \
        [--text-col text] [--id-col doc_id] \
        [--method exact|minhash|simhash|winnow|semdedup] [--threshold 0.7] \
        [--bands 8] [--rows-per-band 2] [--max-bucket 1000] [--shard-rows 192]

Outputs under --output:
  duplicates/   exact method: (content_sha, n_dups, keep_id) groups
  candidates/   minhash/simhash: (id_l, id_r) LSH candidate pairs;
                winnow: (id_l, id_r, shared, containment) fingerprint pairs
  verified/     minhash: candidates with shingle-Jaccard >= threshold;
                simhash: candidates with full-fingerprint Hamming
                distance <= --max-hamming (a chunk collision alone is
                weak evidence — one 8-bit chunk has 256 values, so
                unverified candidates would closure-merge the corpus);
                winnow: candidates with containment >= threshold (the
                MOSS-style asymmetric copied-paragraph score)
  clusters/     near-dup connected components over VERIFIED pairs
                (id, cluster_id) — the "keep one per cluster" table a
                training-data pipeline feeds its document filter
  kept/         semdedup method: (id, cell) SEMANTIC-dedup survivors —
                embedding-cosine duplicates collapsed within
                coarse-quantizer cells (similarity.semdedup_keep);
                needs --vec-col, --threshold is the cosine floor

The LSH paths carry the shared bucket guardrails (singleton drop,
max-bucket cap, adaptive shard salting) so a boilerplate canopy cannot
serialize the run at scale.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument(
        "--method",
        choices=("exact", "minhash", "simhash", "winnow", "semdedup"),
        default="minhash",
    )
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--n-cells", type=int, default=16)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--shingle-k", type=int, default=3)
    p.add_argument("--kgram-k", type=int, default=12)
    p.add_argument("--winnow-window", type=int, default=10)
    p.add_argument("--min-shared", type=int, default=3)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--rows-per-band", type=int, default=2)
    p.add_argument("--simhash-bits", type=int, default=32)
    p.add_argument("--block-bits", type=int, default=4)
    p.add_argument("--max-hamming", type=int, default=3)
    p.add_argument("--max-bucket", type=int, default=1000)
    p.add_argument("--shard-rows", type=int, default=192)
    args = p.parse_args()
    out = args.output.rstrip("/")
    shard_rows = args.shard_rows or None
    max_bucket = args.max_bucket or None

    from bigmatch_utilities_spark.operators.closure import connected_components
    from bigmatch_utilities_spark.operators.dedup import (
        exact_duplicates,
        jaccard_pairs,
        minhash_candidates,
        simhash_candidates,
        simhash_pairs,
    )

    spark = SparkSession.builder.appName("bigmatch-run-dedup").getOrCreate()
    df = (
        spark.read.table(args.input)
        if "." in args.input and "/" not in args.input
        else spark.read.parquet(args.input)
    )

    caches: list = []
    if args.method == "exact":
        exact_duplicates(df, args.text_col, args.id_col).write.mode(
            "overwrite"
        ).parquet(f"{out}/duplicates")
    elif args.method == "semdedup":
        from bigmatch_utilities_spark.operators.similarity import semdedup_keep

        semdedup_keep(
            df,
            threshold=args.threshold,
            n_cells=args.n_cells,
            id_col=args.id_col,
            vec_col=args.vec_col,
            max_cell=max_bucket,
            shard_rows=shard_rows,
        ).write.mode("overwrite").parquet(f"{out}/kept")
    elif args.method == "winnow":
        # MOSS-style containment dedup: shared winnowed fingerprints are
        # both the candidate generator AND the verifier (containment =
        # shared / min fingerprint count), so candidates/ and verified/
        # come from one operator — the asymmetric copied-paragraph case
        # plain Jaccard misses. --threshold here is the containment floor.
        from bigmatch_utilities_spark.operators.winnow import (
            winnow_containment_pairs,
        )

        from pyspark.sql import functions as F

        pairs = winnow_containment_pairs(
            df,
            args.text_col,
            args.id_col,
            k=args.kgram_k,
            w=args.winnow_window,
            min_shared=args.min_shared,
            max_bucket=max_bucket,
            cache_handle=caches,
        )
        pairs.write.mode("overwrite").parquet(f"{out}/candidates")
        verified = spark.read.parquet(f"{out}/candidates").filter(
            F.col("containment") >= F.lit(args.threshold)
        )
        verified.write.mode("overwrite").parquet(f"{out}/verified")
        connected_components(
            spark.read.parquet(f"{out}/verified"), src="id_l", dst="id_r"
        ).write.mode("overwrite").parquet(f"{out}/clusters")
    else:
        if args.method == "minhash":
            cands = minhash_candidates(
                df,
                args.text_col,
                args.id_col,
                shingle_k=args.shingle_k,
                bands=args.bands,
                rows_per_band=args.rows_per_band,
                max_bucket=max_bucket,
                shard_rows=shard_rows,
                cache_handle=caches,
            )
        else:
            cands = simhash_candidates(
                df,
                args.text_col,
                args.id_col,
                bits=args.simhash_bits,
                block_bits=args.block_bits,
                max_bucket=max_bucket,
                shard_rows=shard_rows,
                cache_handle=caches,
            )
        cands.write.mode("overwrite").parquet(f"{out}/candidates")
        cands = spark.read.parquet(f"{out}/candidates")

        if args.method == "minhash":
            verified = jaccard_pairs(
                df,
                cands,
                args.text_col,
                args.id_col,
                shingle_k=args.shingle_k,
                threshold=args.threshold,
            )
        else:
            verified = simhash_pairs(
                df,
                cands,
                args.text_col,
                args.id_col,
                bits=args.simhash_bits,
                max_hamming=args.max_hamming,
            )
        verified.write.mode("overwrite").parquet(f"{out}/verified")
        edges = spark.read.parquet(f"{out}/verified")

        connected_components(edges, src="id_l", dst="id_r").write.mode(
            "overwrite"
        ).parquet(f"{out}/clusters")

    for c in caches:
        c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
