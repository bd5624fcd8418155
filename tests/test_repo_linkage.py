"""North-rule gate: pairwise F1 ≥ 0.99 on labeled pairs of the synthetic
source-code repo table, plus the per-row sha256 content invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.repo_linkage import (
    ID_COL,
    link_and_cluster,
    prepare,
    run_repo_linkage,
    with_record_id,
)
from bigmatch_utilities_spark.synthdata import repo_files_df, true_pairs_pdf

N_CLUSTERS = 150
SEED = 42


@pytest.fixture(scope="module")
def synth(spark):
    pdf = repo_files_df(spark, seed=SEED, n_clusters=N_CLUSTERS).toPandas()
    sdf = spark.createDataFrame(pdf)
    return pdf, sdf


def _f1(pdf, good_pairs_pdf):
    truth = true_pairs_pdf(pdf)
    labeled = set(pdf[pdf.true_cluster != -1].record_id)
    pred = {
        (min(a, b), max(a, b))
        for a, b in zip(
            good_pairs_pdf.id_rec.astype(int), good_pairs_pdf.id_mem.astype(int)
        )
        if a in labeled and b in labeled
    }
    tp = len(pred & truth)
    fp = len(pred - truth)
    fn = len(truth - pred)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return 2 * prec * rec / max(prec + rec, 1e-9), prec, rec


def test_pairwise_f1_gate(synth):
    pdf, sdf = synth
    result = run_repo_linkage(sdf, use_minhash_pass=True)
    good = result.good_pairs().toPandas()
    f1, prec, rec = _f1(pdf, good)
    assert f1 >= 0.99, (f1, prec, rec)


def test_content_sha_invariant(synth):
    """Per-row invariant (BASELINE input_hint): sha256(content) of every
    row survives the pipeline's prepare projection unchanged."""
    import hashlib

    pdf, sdf = synth
    got = {
        r[ID_COL]: r["content_sha"]
        for r in prepare(sdf).select(ID_COL, "content_sha").collect()
    }
    for _, row in pdf.iterrows():
        want = hashlib.sha256(row.content.encode()).hexdigest()
        assert got[row.record_id] == want


def test_clusters_match_truth(synth):
    """Entity clusters = ground-truth clusters on labeled positives."""
    pdf, sdf = synth
    clusters = link_and_cluster(sdf).toPandas()
    merged = pdf.merge(clusters, left_on="record_id", right_on="id")
    pos = merged[merged.true_cluster >= 0]
    # same truth cluster ⇒ same predicted cluster and vice versa (on positives)
    by_truth = pos.groupby("true_cluster")["cluster_id"].nunique()
    assert (by_truth == 1).all(), by_truth[by_truth > 1]
    by_pred = pos.groupby("cluster_id")["true_cluster"].nunique()
    assert (by_pred == 1).all(), by_pred[by_pred > 1]


def test_record_id_deterministic(synth):
    _, sdf = synth
    a = with_record_id(sdf.drop(ID_COL)).select("repo", "path", "commit", ID_COL)
    b = with_record_id(sdf.drop(ID_COL)).select("repo", "path", "commit", ID_COL)
    assert a.exceptAll(b).count() == 0
    n = a.count()
    assert a.select(ID_COL).distinct().count() == n


def test_dedupe_canonical_orientation(synth):
    _, sdf = synth
    result = run_repo_linkage(sdf, use_minhash_pass=False)
    bad = result.pairs.filter(F.col("id_rec") >= F.col("id_mem")).count()
    assert bad == 0
