"""Benchmark harness — prints ONE JSON line.

Headline queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

  linkage_docs     full multi-pass linkage (4 passes incl. MinHash-LSH)
                   over the documents table recast as repo-files
  linkage_synth    linkage + transitive closure over the deterministic
                   synthetic repo-files table (the north-rule input)
  dedup_minhash    MinHash band candidates over documents
  ann_topk         brute-force cosine top-10, 100 queries x all embeddings
  ta_profile       language-ID + quality + fingerprint over documents
  closure_chain    connected components over derived chain edges
  simhash          SimHash LSH candidates + full-fingerprint Hamming
                   verification over documents (round-3 key)
  near_dedup_keep  end-to-end LSH -> Jaccard -> closure -> keep-one
                   over documents (round-3 key)
  ann_ivf          IVF top-10, 100 queries, nprobe=2/16 (round-3 key)
  em_mu            EM m/u calibration over the blocked documents pairs
                   (round-3 key; histogram pass + driver-side EM)
  winnow           MOSS winnowing fingerprints -> shared-fp candidate
                   pairs over documents (round-4 key)
  snm              sorted-neighborhood blocking, window=4, distributed
                   global rank (round-4 key)
  tfidf            TF-IDF postings + integer cosine over hash-blocked
                   candidate pairs (round-4 key)
  one_to_one       mutual-best 1:1 assignment over blocked+scored pairs
                   (round-4 key; same body as the u5 oracle query)
  inc_closure      incremental closure maintenance vs a standing
                   assignment table (round-4 key; ic oracle query body)

The JSON also carries `pairwise_f1` / `pairwise_precision` /
`pairwise_recall` counters — the north-rule F1 of the linkage's accepted
pairs against the synthetic table's labels, recomputed distributed every
round (VERDICT r3 #6).

`value` is total wall seconds (sum of per-query best-of-2 — see
BENCH.md's host-noise caveat; both raw runs are reported under
`queries_all_runs`); `candidate_pairs_per_sec` is the throughput metric
from BASELINE.json (candidate pairs scored / second during the linkage
queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigmatch_utilities_spark.operators.closure import connected_components
from bigmatch_utilities_spark.operators.dedup import (
    minhash_candidates,
    near_dedup_keep,
    simhash_candidates,
    simhash_pairs,
)
from bigmatch_utilities_spark.operators.similarity import cosine, ivf_topk
from bigmatch_utilities_spark.operators.textanalysis import analyze_documents
from bigmatch_utilities_spark.repo_linkage import (
    count_candidates,
    link_and_cluster,
    run_repo_linkage,
)
from bigmatch_utilities_spark.session import get_spark
from bigmatch_utilities_spark.synthdata import repo_files_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SYNTH_CLUSTERS = int(os.environ.get("BENCH_SYNTH_CLUSTERS", "4000"))


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timings: dict[str, float] = {}
    timings_all: dict[str, list[float]] = {}
    counters: dict[str, float] = {}

    def timed(name: str, fn):
        # best-of-2: this box's hypervisor steal inflates single-shot walls
        # up to 6x minute-to-minute (BENCH.md "host-noise caveat"); the min
        # of two runs is the least-interfered estimate. Result counters are
        # asserted identical across runs — repetition can't change results.
        walls, outs = [], []
        for _ in range(2):
            t0 = time.time()
            outs.append(fn())
            walls.append(round(time.time() - t0, 3))
        assert outs[0] == outs[1], (name, outs)
        timings[name] = min(walls)
        timings_all[name] = walls
        return outs[0]

    # -- linkage over documents-as-repo-files ------------------------------
    repo_files = docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )

    def q_linkage_docs():
        caches: list = []
        r = run_repo_linkage(repo_files, use_minhash_pass=True, cache_handle=caches)
        n = r.pairs.count()
        for c in caches:
            c.unpersist()
        return n

    counters["linkage_docs_pairs"] = timed("linkage_docs", q_linkage_docs)

    # -- linkage + closure over the synthetic north-rule table -------------
    # generation is NOT part of the measured pipeline: materialize the
    # input first, then time linkage + closure over the parquet scan.
    synth_path = os.path.join(
        "/tmp", f"spark_graft_bench_synth_{SYNTH_CLUSTERS}"
    )
    if not os.path.exists(os.path.join(synth_path, "_SUCCESS")):
        repo_files_df(
            spark, seed=42, n_clusters=SYNTH_CLUSTERS, partitions=CPUS
        ).write.mode("overwrite").parquet(synth_path)
    synth = spark.read.parquet(synth_path)

    def q_linkage_synth():
        clusters = link_and_cluster(synth, use_minhash_pass=False)
        return clusters.count()

    counters["linkage_synth_rows"] = timed("linkage_synth", q_linkage_synth)

    # -- dedup --------------------------------------------------------------
    def q_minhash():
        caches: list = []
        n = minhash_candidates(
            docs, "text", "doc_id", shingle_k=3, bands=8, rows_per_band=2,
            cache_handle=caches,
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["minhash_candidates"] = timed("dedup_minhash", q_minhash)

    # -- ANN ------------------------------------------------------------------
    def q_ann():
        qs = emb.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        scored = (
            emb.crossJoin(F.broadcast(qs))
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("score", cosine(F.col("embedding"), F.col("qvec")))
        )
        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .count()
        )

    counters["ann_rows"] = timed("ann_topk", q_ann)

    # -- text analysis ----------------------------------------------------------
    def q_ta():
        return analyze_documents(docs, "text").select(
            F.sum("n_tokens"), F.countDistinct("lang_detected")
        ).collect()[0][0]

    counters["ta_tokens"] = int(timed("ta_profile", q_ta) or 0)

    # -- closure -------------------------------------------------------------------
    def q_closure():
        a = docs.select(F.col("doc_id").alias("src"), "lang", "n_chars")
        b = docs.select(
            F.col("doc_id").alias("dst"),
            F.col("lang").alias("l2"),
            F.col("n_chars").alias("n2"),
        )
        edges = a.join(
            b, (F.col("lang") == F.col("l2")) & (F.col("n2") == F.col("n_chars") + 1)
        ).select("src", "dst")
        return connected_components(edges).count()

    counters["closure_nodes"] = timed("closure_chain", q_closure)

    # -- round-3 additions (new keys; the six above stay untouched so
    # BENCH_r01/r02 remain directly comparable) ---------------------------
    def q_simhash():
        caches: list = []
        cands = simhash_candidates(docs, "text", "doc_id", cache_handle=caches)
        n = simhash_pairs(docs, cands, "text", "doc_id").count()
        for c in caches:
            c.unpersist()
        return n

    counters["simhash_verified_pairs"] = timed("simhash", q_simhash)

    def q_near_dedup_keep():
        caches: list = []
        n = near_dedup_keep(
            docs, "text", "doc_id", shingle_k=3, bands=8, rows_per_band=2,
            threshold=0.7, cache_handle=caches,
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["near_dedup_kept"] = timed("near_dedup_keep", q_near_dedup_keep)

    def q_ann_ivf():
        qs = emb.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        )
        return ivf_topk(emb, qs, k=10, n_pivots=16, nprobe=2).count()

    counters["ann_ivf_rows"] = timed("ann_ivf", q_ann_ivf)

    def q_em_mu():
        import __spark_entry__ as entrymod

        out = entrymod.queries()["em_mu_estimate"](spark, SF_DIR)
        return out.count()

    counters["em_mu_fields"] = timed("em_mu", q_em_mu)

    # -- round-4 keys (stable keys above untouched) -------------------------
    def q_winnow():
        from bigmatch_utilities_spark.operators.winnow import winnow_shared_pairs

        caches: list = []
        n = winnow_shared_pairs(
            docs, "text", "doc_id", cache_handle=caches
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["winnow_pairs"] = timed("winnow", q_winnow)

    def q_snm():
        from bigmatch_utilities_spark.operators.sorted_neighborhood import (
            sorted_neighborhood_pairs,
        )

        caches: list = []
        n = sorted_neighborhood_pairs(
            docs, ["lang", "n_chars"], "doc_id", window=4, cache_handle=caches
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["snm_pairs"] = timed("snm", q_snm)

    def q_tfidf():
        from bigmatch_utilities_spark.operators.tfidf_sim import (
            tfidf_cosine_pairs,
            tfidf_postings,
        )

        post = tfidf_postings(docs, "text", "doc_id")
        d = docs.select("doc_id", F.substring(F.md5("text"), 1, 2).alias("hkey"))
        prs = (
            d.alias("a")
            .join(d.alias("b"), "hkey")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("id_l"), F.col("b.doc_id").alias("id_r"))
        )
        caches: list = []
        n = tfidf_cosine_pairs(post, prs, cache_handle=caches).count()
        for c in caches:
            c.unpersist()
        return n

    counters["tfidf_pairs"] = timed("tfidf", q_tfidf)

    def q_one_to_one():
        import __spark_entry__ as entrymod

        return entrymod.queries()["u5_one_to_one"](spark, SF_DIR).count()

    counters["one_to_one_rows"] = timed("one_to_one", q_one_to_one)

    def q_inc_closure():
        import __spark_entry__ as entrymod

        return entrymod.queries()["ic_incremental_closure"](spark, SF_DIR).count()

    counters["inc_closure_rows"] = timed("inc_closure", q_inc_closure)

    # round-5 keys: declarative equi+SNM mixed-pass pipeline and
    # containment-normalized winnowing
    def q_snm_mix():
        import __spark_entry__ as entrymod

        return entrymod.queries()["sp_snm_pass_mix"](spark, SF_DIR).count()

    counters["snm_mix_pairs"] = timed("snm_mix", q_snm_mix)

    def q_containment():
        from bigmatch_utilities_spark.operators.winnow import (
            winnow_containment_pairs,
        )

        caches: list = []
        n = winnow_containment_pairs(
            docs, "text", "doc_id", cache_handle=caches
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["containment_pairs"] = timed("containment", q_containment)

    # round-5 second-session keys: nightly-delta linkage (the incremental
    # match path) and repo-level containment (fork detection)
    def q_delta_linkage():
        from bigmatch_utilities_spark.repo_linkage import run_repo_linkage_delta

        caches: list = []
        d = repo_files.filter(F.crc32("path") % 5 == 0)
        s = repo_files.filter(F.crc32("path") % 5 != 0)
        r = run_repo_linkage_delta(d, s, cache_handle=caches)
        n = r.pairs.count()
        for c in caches:
            c.unpersist()
        return n

    counters["delta_pairs"] = timed("delta_linkage", q_delta_linkage)

    def q_repo_containment():
        from bigmatch_utilities_spark.operators.winnow import (
            group_containment_pairs,
        )

        caches: list = []
        n = group_containment_pairs(
            docs, "text", "doc_id", "source", min_shared=3, max_df=8,
            cache_handle=caches,
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["repo_containment_pairs"] = timed(
        "repo_containment", q_repo_containment
    )

    # round-5 third-session keys: audit-gated cluster repair (closure +
    # quality audit + suspect-subgraph re-closure) and PPRL bloom-band
    # blocking (encode + band keys + capped bucket join)
    def q_repair():
        import __spark_entry__ as entrymod

        return entrymod.queries()["rp_cluster_repair"](spark, SF_DIR).count()

    counters["repair_rows"] = timed("repair", q_repair)

    def q_bloom_band():
        import __spark_entry__ as entrymod

        return entrymod.queries()["pb_bloom_band_blocking"](spark, SF_DIR).count()

    counters["bloom_band_pairs"] = timed("bloom_band", q_bloom_band)

    # round-5 fourth-session keys: the declarative equi+qgram+suffix
    # mixed-pass pipeline and the extended comparator vocabulary (d/n/t)
    def q_qgram_suffix_mix():
        import __spark_entry__ as entrymod

        return entrymod.queries()["qs_qgram_suffix_pass_mix"](spark, SF_DIR).count()

    counters["qgram_suffix_mix_pairs"] = timed(
        "qgram_suffix_mix", q_qgram_suffix_mix
    )

    def q_extended_comparators():
        import __spark_entry__ as entrymod

        return entrymod.queries()["cx_extended_comparators"](spark, SF_DIR).count()

    counters["extended_comparator_pairs"] = timed(
        "extended_comparators", q_extended_comparators
    )

    # temporal operators: one-shuffle as-of attach and the bucketed
    # interval-overlap pass; plus induced standardization dictionaries
    def q_asof():
        import __spark_entry__ as entrymod

        return entrymod.queries()["tj_asof_join"](spark, SF_DIR).count()

    counters["asof_rows"] = timed("asof_join", q_asof)

    def q_interval_pass():
        import __spark_entry__ as entrymod

        return entrymod.queries()["tp_interval_pass"](spark, SF_DIR).count()

    counters["interval_pass_pairs"] = timed("interval_pass", q_interval_pass)

    def q_value_canon():
        import __spark_entry__ as entrymod

        return entrymod.queries()["vc_value_canonicalize"](spark, SF_DIR).count()

    counters["value_canon_rows"] = timed("value_canon", q_value_canon)

    # round-5 fifth-session keys: benchmark-contamination n-gram overlap
    # and weighted-node-pruning meta-blocking over documents
    def q_contamination():
        import __spark_entry__ as entrymod

        return entrymod.queries()["bc_contamination"](spark, SF_DIR).count()

    counters["contamination_docs"] = timed("contamination", q_contamination)

    def q_wnp():
        import __spark_entry__ as entrymod
        from bigmatch_utilities_spark.operators.meta_blocking import wnp_pairs

        caches: list = []
        n = wnp_pairs(
            docs, "doc_id", entrymod._MB_KEYS, max_block_rows=256,
            cache_handle=caches,
        ).count()
        for c in caches:
            c.unpersist()
        return n

    counters["wnp_pairs"] = timed("wnp", q_wnp)

    # round-5 seventh-session keys: the declarative comparison-level pass
    # (graded gammas through run_match) and the posterior-calibration
    # audit (EM + per-pair posterior + binned reliability/Brier)
    def q_level_pass():
        import __spark_entry__ as entrymod

        return entrymod.queries()["le_level_pass_mix"](spark, SF_DIR).count()

    counters["level_pass_pairs"] = timed("level_pass", q_level_pass)

    def q_calibration():
        import __spark_entry__ as entrymod

        return entrymod.queries()["pl_posterior_calibration"](
            spark, SF_DIR
        ).count()

    counters["calibration_bins"] = timed("calibration", q_calibration)

    # round-5 eighth-session keys: cross-document duplicated-span profile
    # (positional winnowing), rarest-token canopy assignment + the
    # canopy-mix pass, and the Monge-Elkan comparator over blocked pairs
    def q_span_dedup():
        import __spark_entry__ as entrymod

        return entrymod.queries()["sd_duplicated_spans"](spark, SF_DIR).count()

    counters["span_dedup_docs"] = timed("span_dedup", q_span_dedup)

    def q_canopy_mix():
        import __spark_entry__ as entrymod

        return entrymod.queries()["cp_canopy_pass_mix"](spark, SF_DIR).count()

    counters["canopy_mix_pairs"] = timed("canopy_mix", q_canopy_mix)

    def q_monge_elkan():
        import __spark_entry__ as entrymod

        return entrymod.queries()["mc_monge_elkan"](spark, SF_DIR).count()

    counters["monge_elkan_pairs"] = timed("monge_elkan", q_monge_elkan)

    # round-5 ninth-session keys: semantic dedup within IVF cells and the
    # soft TF-IDF hybrid comparator
    def q_semdedup():
        import __spark_entry__ as entrymod

        return entrymod.queries()["sm_semdedup_keep"](spark, SF_DIR).count()

    counters["semdedup_rows"] = timed("semdedup", q_semdedup)

    def q_soft_tfidf():
        import __spark_entry__ as entrymod

        return entrymod.queries()["so_soft_tfidf"](spark, SF_DIR).count()

    counters["soft_tfidf_pairs"] = timed("soft_tfidf", q_soft_tfidf)

    # round-5 tenth-session keys: NYSIIS phonetic blocking, DSIR
    # importance selection, the skew-safe domain quota, and the
    # gamma-pattern dependence diagnostic
    def q_nysiis():
        import __spark_entry__ as entrymod

        return entrymod.queries()["nv_nysiis_blocking"](spark, SF_DIR).count()

    counters["nysiis_pairs"] = timed("nysiis_blocking", q_nysiis)

    def q_dsir():
        import __spark_entry__ as entrymod

        return entrymod.queries()["ir_dsir_select"](spark, SF_DIR).count()

    counters["dsir_rows"] = timed("dsir_select", q_dsir)

    def q_quota():
        import __spark_entry__ as entrymod

        return entrymod.queries()["qc_domain_quota"](spark, SF_DIR).count()

    counters["quota_rows"] = timed("quota_cap", q_quota)

    def q_pattern_dep():
        import __spark_entry__ as entrymod

        return entrymod.queries()["pd_pattern_dependence"](spark, SF_DIR).count()

    counters["pattern_dep_rows"] = timed("pattern_dependence", q_pattern_dep)

    def q_capacitated():
        import __spark_entry__ as entrymod

        return entrymod.queries()["gb_capacitated_assignment"](
            spark, SF_DIR
        ).count()

    counters["capacitated_rows"] = timed("capacitated_assign", q_capacitated)

    def q_dsir_sample():
        import __spark_entry__ as entrymod

        return entrymod.queries()["is_dsir_sample"](spark, SF_DIR).count()

    counters["dsir_sample_rows"] = timed("dsir_sample", q_dsir_sample)

    def q_line_dedup():
        import __spark_entry__ as entrymod

        return entrymod.queries()["lf_line_dedup"](spark, SF_DIR).count()

    counters["line_dedup_docs"] = timed("line_dedup", q_line_dedup)

    # throughput denominator: candidate pairs actually entering the
    # comparator stage (BASELINE's candidate-pairs/sec unit), counted on
    # the same plans after the timed runs so the count jobs don't pollute
    # the wall measurements.
    cand_docs = count_candidates(repo_files, use_minhash_pass=True)
    cand_synth = count_candidates(synth, use_minhash_pass=False)
    counters["candidates_docs"] = cand_docs
    counters["candidates_synth"] = cand_synth

    # north-rule F1, machine-checked every round (VERDICT r3 #6): pairwise
    # metrics of the linkage's accepted pairs vs the synthetic labels,
    # restricted to labeled records (true_cluster != -1; boilerplate rows
    # are unlabeled by construction). Distributed end to end — semi-joins
    # to filter, a per-cluster self-join for truth, evaluate.pairwise_metrics
    # for the counts. Runs after the timed section (not a wall key).
    from bigmatch_utilities_spark.operators.evaluate import pairwise_metrics

    lab = synth.select("record_id", "true_cluster").filter(
        F.col("true_cluster") != -1
    )
    good = run_repo_linkage(synth, use_minhash_pass=False).good_pairs()
    pred = good.join(
        lab.select(F.col("record_id").alias("id_rec")), "id_rec", "left_semi"
    ).join(lab.select(F.col("record_id").alias("id_mem")), "id_mem", "left_semi")
    pos = lab.filter(F.col("true_cluster") >= 0)
    truth = (
        pos.select("true_cluster", F.col("record_id").alias("id_rec"))
        .join(
            pos.select("true_cluster", F.col("record_id").alias("id_mem")),
            "true_cluster",
        )
        .filter(F.col("id_rec") < F.col("id_mem"))
        .select("id_rec", "id_mem")
    )
    m = pairwise_metrics(pred, truth, "id_rec", "id_mem").collect()[0]
    counters["pairwise_f1"] = float(m["f1"])
    counters["pairwise_precision"] = float(m["precision"])
    counters["pairwise_recall"] = float(m["recall"])

    total = round(sum(timings.values()), 3)
    linkage_secs = timings["linkage_docs"] + timings["linkage_synth"]
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_all_runs": timings_all,
                "sf": SF_DIR,
                "cpus": CPUS,
                "counters": counters,
                "candidate_pairs_per_sec": round(
                    (cand_docs + cand_synth) / max(linkage_secs, 1e-9), 1
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
