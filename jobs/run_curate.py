"""spark-submit entrypoint: end-to-end training-corpus curation.

    spark-submit --py-files bigmatch_utilities_spark.zip jobs/run_curate.py \
        --input <parquet-or-table> --output <dir> \
        [--text-col text] [--id-col doc_id] \
        [--min-quality 0.0] [--max-dup-frac 1.0] [--rep-ngram 2] \
        [--threshold 0.7] [--bands 8] [--rows-per-band 2] [--shingle-k 3] \
        [--max-bucket 1000] [--shard-rows 0] [--keep-by quality|min-id] \
        [--benchmark <parquet>] [--max-contamination 1.0] [--contam-ngram 5] \
        [--sample-col lang --sample-rate en=0.35 --sample-default 1.0] \
        [--train-pct 80] [--val-pct 10]

The post-linkage corpus pipeline (operators/corpus_ops.py +
operators/dedup.py + operators/textanalysis.py), chained in the order a
production run wants — cheap map-only filters BEFORE the shuffling
stages, so the expensive LSH/join work only sees survivors:

  1. profile   quality score + repetition dup_frac (map-only projections)
  2. filter    drop rows under --min-quality or over --max-dup-frac
  2b. spandup  (with --max-span-dup-frac) CROSS-document duplicated-span
               profile (operators/substring_dedup, the ExactSubstr-style
               positional-winnowing detector); drop rows whose verbatim
               cross-doc duplicated fraction exceeds the bound — catches
               the boilerplate-heavy documents whole-doc MinHash keeps
  2b2. linededup (with --line-dedup-min-df) strip every line shared
               verbatim by >= N distinct docs — CCNet/RefinedWeb line
               dedup; excised-line total goes to stats.json
  3. dedup     MinHash-LSH -> shingle-Jaccard -> connected components;
               per near-dup cluster keep the --keep-by representative
               (quality = best copy survives; min-id = deterministic
               legacy election)
  4. decontam  (with --benchmark) distinct word n-gram overlap against
               the benchmark corpus; drop rows whose contaminated
               fraction exceeds --max-contamination
  4b. mix      (with --sample-col) deterministic per-stratum downsample
               to target proportions (md5-bucket rate; monotone in the
               rate, reproducible across engines and cluster sizes)
  4c. dsir     (with --dsir-target) DSIR importance selection: keep the
               --dsir-keep rows most target-like under hashed-unigram
               importance weights (integer micro-nats, deterministic)
  4d. quota    (with --max-per-domain) skew-safe per-domain cap — at
               most N best-quality rows per --domain-col value
  5. split     leakage-safe train/val/test at near-dup-CLUSTER
               granularity — the split bucket is a pure function of the
               cluster id, so near-duplicates can never straddle splits

Outputs under --output:
  curated/     kept rows + (quality, dup_frac[, contaminated_frac],
               cluster_id, split)
  stats.json   per-stage row counts (input, after_filter, after_dedup,
               after_decontam, per-split) — the audit trail

Every count in stats.json is a Spark aggregate (single-row collects);
nothing row-level ever reaches the driver.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _read(spark: SparkSession, path: str):
    return (
        spark.read.table(path)
        if "." in path and "/" not in path
        else spark.read.parquet(path)
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--min-quality", type=float, default=0.0)
    p.add_argument("--max-dup-frac", type=float, default=1.0)
    p.add_argument("--rep-ngram", type=int, default=2)
    p.add_argument(
        "--max-span-dup-frac",
        type=float,
        default=None,
        help="drop rows whose CROSS-document duplicated-span fraction "
        "(ExactSubstr-style positional winnowing) exceeds this bound",
    )
    p.add_argument("--span-k", type=int, default=12)
    p.add_argument("--span-w", type=int, default=10)
    p.add_argument(
        "--drop-licenses",
        default=None,
        help="comma list of detected license ids to drop (e.g. "
        "GPL-3.0,GPL-2.0,MPL-2.0); 'none' drops no-license files",
    )
    p.add_argument(
        "--ppl-keep",
        default=None,
        help="comma list of LM-perplexity buckets to keep (head,middle,"
        "tail); e.g. --ppl-keep head,middle drops the worst tertile "
        "(CCNet). Unscoreable (<2-char) docs always pass.",
    )
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--shingle-k", type=int, default=3)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--rows-per-band", type=int, default=2)
    p.add_argument("--max-bucket", type=int, default=1000)
    p.add_argument("--shard-rows", type=int, default=0)
    p.add_argument("--keep-by", choices=("quality", "min-id"), default="quality")
    p.add_argument("--benchmark", default=None)
    p.add_argument("--max-contamination", type=float, default=1.0)
    p.add_argument("--contam-ngram", type=int, default=5)
    p.add_argument("--train-pct", type=int, default=80)
    p.add_argument("--val-pct", type=int, default=10)
    p.add_argument(
        "--sample-col",
        default=None,
        help="stratum column for the deterministic data-mixing downsample",
    )
    p.add_argument(
        "--sample-rate",
        action="append",
        default=[],
        metavar="VALUE=RATE",
        help="per-stratum keep rate (repeatable), e.g. --sample-rate en=0.35",
    )
    p.add_argument("--sample-default", type=float, default=1.0)
    p.add_argument(
        "--line-dedup-min-df",
        type=int,
        default=None,
        help="strip every line shared verbatim by >= N distinct docs "
        "(CCNet/RefinedWeb line dedup) before the whole-doc near-dedup; "
        "total excised lines go to stats.json as lines_removed",
    )
    p.add_argument(
        "--dsir-target",
        default=None,
        help="parquet/table of target-domain documents; keeps the "
        "--dsir-keep rows with the highest DSIR importance weight",
    )
    p.add_argument("--dsir-keep", type=int, default=1000)
    p.add_argument("--dsir-buckets", type=int, default=1 << 16)
    p.add_argument(
        "--max-per-domain",
        type=int,
        default=None,
        help="per-domain quota: keep at most N best-quality rows per "
        "--domain-col value (skew-safe salted top-N)",
    )
    p.add_argument("--domain-col", default="source")
    p.add_argument(
        "--scrub-pii",
        action="store_true",
        help="redact emails/IPv4/SSN/phone-shaped spans from the text "
        "column before any other stage; per-category totals go to "
        "stats.json",
    )
    args = p.parse_args()
    out = args.output.rstrip("/")
    idc, txt = args.id_col, args.text_col

    from bigmatch_utilities_spark.operators.closure import connected_components
    from bigmatch_utilities_spark.operators.corpus_ops import (
        contamination_report,
        leakage_safe_split,
        repetition_profile,
        stratified_sample,
    )
    from bigmatch_utilities_spark.operators.dedup import (
        jaccard_pairs,
        minhash_candidates,
    )
    from bigmatch_utilities_spark.operators.textanalysis import quality_score

    spark = SparkSession.builder.appName("bigmatch-run-curate").getOrCreate()
    df = _read(spark, args.input)
    stats: dict[str, int] = {}

    # 0. optional PII scrub — map-only, so it fuses into the first scan;
    # the input count and the per-category totals come from ONE aggregate
    if args.scrub_pii:
        from bigmatch_utilities_spark.operators.corpus_ops import (
            PII_PATTERNS,
            pii_scrub,
        )

        df = pii_scrub(df, txt, out_col="_pii_scrubbed")
        agg = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(f"n_{name}").alias(name) for name, _, _ in PII_PATTERNS],
        ).collect()[0]
        stats["input"] = int(agg["_n"])
        for name, _, _ in PII_PATTERNS:
            stats[f"pii_{name}"] = int(agg[name] or 0)
        df = df.drop(txt, *[f"n_{name}" for name, _, _ in PII_PATTERNS])
        df = df.withColumnRenamed("_pii_scrubbed", txt)
    else:
        stats["input"] = df.count()

    # 1-2. map-only profile + filter (runs BEFORE any shuffle)
    rep = repetition_profile(df, txt, idc, n=args.rep_ngram).select(
        F.col("id").alias(idc), "dup_frac"
    )
    profiled = (
        df.withColumn("quality", quality_score(F.col(txt)))
        .join(rep, idc)
        .filter(F.col("quality") >= args.min_quality)
        .filter(
            F.col("dup_frac").isNull() | (F.col("dup_frac") <= args.max_dup_frac)
        )
    )
    stats["after_filter"] = profiled.count()

    # 2a. optional license gate (code corpora: permissive-only policies
    # drop copyleft files) — map-only codegen CASE, runs before any shuffle
    if args.drop_licenses:
        from bigmatch_utilities_spark.operators.corpus_ops import (
            license_detect,
        )

        drop = {s.strip() for s in args.drop_licenses.split(",") if s.strip()}
        profiled = (
            profiled.withColumn("_lic", license_detect(F.col(txt)))
            .filter(~F.col("_lic").isin(*sorted(drop)))
            .drop("_lic")
        )
        stats["after_license_filter"] = profiled.count()

    caches: list = []

    # 2b. optional cross-document duplicated-span filter (ExactSubstr-style
    # doc-level remediation: a doc that is mostly verbatim spans of OTHER
    # docs is template noise even when no whole-doc near-dup exists)
    if args.max_span_dup_frac is not None:
        from bigmatch_utilities_spark.operators.substring_dedup import (
            duplicated_span_profile,
        )

        sd = duplicated_span_profile(
            profiled, txt, idc, k=args.span_k, w=args.span_w,
            cache_handle=caches,
        ).select(idc, F.col("dup_frac").alias("_span_dup"))
        profiled = (
            profiled.join(sd, idc, "left")
            .filter(
                F.col("_span_dup").isNull()
                | (F.col("_span_dup") <= args.max_span_dup_frac)
            )
            .drop("_span_dup")
        )
    stats["after_span_dedup"] = profiled.count()

    # 2b2. optional cross-document frequent-line excision (CCNet/
    # RefinedWeb line dedup: strip lines shared verbatim by >= N docs —
    # navigation chrome / license footers — and keep the cleaned text)
    if args.line_dedup_min_df is not None:
        from bigmatch_utilities_spark.operators.corpus_ops import line_dedup

        ld = line_dedup(
            profiled, txt, idc, min_df=args.line_dedup_min_df
        ).select(F.col("doc_id").alias(idc), "clean_text", "n_removed")
        profiled = (
            profiled.join(ld, idc)
            .drop(txt)
            .withColumnRenamed("clean_text", txt)
        )
        stats["lines_removed"] = int(
            profiled.agg(F.sum("n_removed")).collect()[0][0] or 0
        )
        profiled = profiled.drop("n_removed")

    # 2c. optional LM-perplexity bucket filter (CCNet discipline: rank by
    # corpus-trained char-bigram NLL, keep the named tertiles)
    if args.ppl_keep:
        from bigmatch_utilities_spark.operators.lm_quality import (
            lm_quality_buckets,
        )

        keep = {b.strip() for b in args.ppl_keep.split(",") if b.strip()}
        bad = keep - {"head", "middle", "tail"}
        if bad:
            raise SystemExit(f"--ppl-keep: unknown bucket(s) {sorted(bad)}")
        lb = lm_quality_buckets(
            profiled, text_col=txt, id_col=idc, cache_handle=caches
        ).select(F.col("doc_id").alias(idc), "bucket")
        profiled = (
            profiled.join(lb, idc, "left")
            # docs too short to score (no bigrams) pass through: the LM
            # has no evidence against them; length policy is --min-quality's
            .filter(F.col("bucket").isNull() | F.col("bucket").isin(*keep))
            .drop("bucket")
        )
        stats["after_ppl_filter"] = profiled.count()

    # 3. near-dedup with survivor election (closure computed ONCE — the
    # same comps frame later drives the leakage-safe split)
    cands = minhash_candidates(
        profiled,
        txt,
        idc,
        shingle_k=args.shingle_k,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        max_bucket=args.max_bucket or None,
        shard_rows=args.shard_rows or None,
        cache_handle=caches,
    )
    verified = jaccard_pairs(
        profiled, cands, txt, idc, shingle_k=args.shingle_k, threshold=args.threshold
    )
    comps = connected_components(verified, src="id_l", dst="id_r")
    comps.write.mode("overwrite").parquet(f"{out}/clusters")
    comps = spark.read.parquet(f"{out}/clusters")

    if args.keep_by == "quality":
        prio = profiled.select(F.col(idc).alias("id"), F.col("quality").alias("_p"))
        elected = (
            comps.join(prio, "id")
            .groupBy("cluster_id")
            .agg(F.min(F.struct((-F.col("_p")).alias("np"), F.col("id").alias("id"))).alias("_e"))
            .select(F.col("_e.id").alias("id"))
        )
        drop = comps.select("id").join(elected, "id", "left_anti")
    else:
        drop = comps.filter(F.col("id") != F.col("cluster_id")).select("id")
    deduped = profiled.join(
        drop.select(F.col("id").alias(idc)), idc, "left_anti"
    )
    stats["after_dedup"] = deduped.count()

    # 4. optional benchmark decontamination
    if args.benchmark:
        bench = _read(spark, args.benchmark)
        contam = contamination_report(
            deduped, bench, txt, idc, n=args.contam_ngram
        ).select(F.col("id").alias(idc), "contaminated_frac")
        deduped = deduped.join(contam, idc, "left").filter(
            F.col("contaminated_frac").isNull()
            | (F.col("contaminated_frac") <= args.max_contamination)
        )
    stats["after_decontam"] = deduped.count()

    # 4b. optional deterministic data-mixing downsample (per-stratum md5
    # rate; monotone in the rate, reproducible across engines/clusters)
    if args.sample_col:
        rates = {}
        for spec in args.sample_rate:
            k, _, v = spec.partition("=")
            rates[k] = float(v)
        deduped = stratified_sample(
            deduped, idc, args.sample_col, rates,
            default_rate=args.sample_default,
        )
    stats["after_mix"] = deduped.count()

    # 4c. optional DSIR importance selection toward a target corpus
    # (operators/dsir.py): keep the --dsir-keep raw docs whose hashed-
    # unigram importance weight toward --dsir-target is highest
    if args.dsir_target:
        from bigmatch_utilities_spark.operators.dsir import dsir_keep

        tgt = _read(spark, args.dsir_target)
        kept_ids = dsir_keep(
            tgt,
            deduped,
            args.dsir_keep,
            text_col=txt,
            id_col=idc,
            buckets=args.dsir_buckets,
        ).select(F.col("doc_id").alias(idc))
        deduped = deduped.join(kept_ids, idc, "left_semi")
        stats["after_dsir"] = deduped.count()

    # 4d. optional per-domain quota cap (operators/corpus_ops.quota_cap):
    # at most --max-per-domain best-quality rows per --domain-col value
    if args.max_per_domain is not None:
        from bigmatch_utilities_spark.operators.corpus_ops import quota_cap

        deduped = quota_cap(
            deduped,
            idc,
            args.domain_col,
            args.max_per_domain,
            quality_col="quality",
        ).drop("quota_rank")
        stats["after_quota"] = deduped.count()

    # 5. leakage-safe split at cluster granularity (survivors of a cluster
    # inherit the CLUSTER's bucket; never-clustered rows bucket on own id)
    asg = (
        deduped.select(F.col(idc).alias("id"))
        .join(comps, "id", "left")
        .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
    )
    split = leakage_safe_split(
        asg, train_pct=args.train_pct, val_pct=args.val_pct
    )
    curated = deduped.join(
        split.select(F.col("id").alias(idc), "cluster_id", "split"), idc
    )
    curated.write.mode("overwrite").parquet(f"{out}/curated")
    curated = spark.read.parquet(f"{out}/curated")
    for r in curated.groupBy("split").count().collect():
        stats[f"split_{r['split']}"] = r["count"]

    with open(f"{out}/stats.json", "w") as fh:
        json.dump(stats, fh, indent=2, sort_keys=True)
    print(json.dumps(stats, sort_keys=True))

    for c in caches:
        c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
