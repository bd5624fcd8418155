"""run_evaluate CLI: every evaluation surface from one spark-submit step.
Runs main() in-process (getOrCreate reuses the test session)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import duckdb
from pyspark.sql import functions as F


def _run(monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", argv)
    spec = importlib.util.spec_from_file_location(
        "run_evaluate",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "jobs", "run_evaluate.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def test_run_evaluate_cli_all_surfaces(spark, tmp_path, monkeypatch):
    # scored pairs with a posterior column; truth = the 3 true pairs
    pairs = spark.createDataFrame(
        [
            (1, 2, 5.0, 0.99),
            (3, 4, 4.0, 0.95),
            (5, 6, -1.0, 0.30),   # true pair the cutoff misses
            (7, 8, 3.0, 0.90),    # false positive
        ],
        "id_rec long, id_mem long, weight double, posterior double",
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_l long, id_r long"
    )
    strata = spark.createDataFrame(
        [(i, "g1" if i <= 4 else "g2") for i in range(1, 9)],
        "id long, stratum string",
    )
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 11), (5, 12), (6, 13)],
        "id long, cluster_id long",
    )
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "C"), (6, "C")],
        "id long, label string",
    )
    pin = str(tmp_path / "pairs")
    tin = str(tmp_path / "truth")
    sin = str(tmp_path / "strata")
    cin = str(tmp_path / "clusters")
    lin = str(tmp_path / "labels")
    pairs.write.parquet(pin)
    truth.write.parquet(tin)
    strata.write.parquet(sin)
    clusters.write.parquet(cin)
    labels.write.parquet(lin)
    out = str(tmp_path / "eval")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _run(
        monkeypatch,
        [
            "run_evaluate.py",
            "--pairs", pin,
            "--truth", tin,
            "--output", out,
            "--threshold", "0.0",
            "--strata", sin,
            "--clusters", cin,
            "--labels", lin,
            "--sweep=-2.0,0.0,4.5",
            "--posterior-col", "posterior",
        ],
    )

    stats = json.load(open(os.path.join(out, "stats.json")))
    pw = stats["pairwise"]
    # threshold 0.0: pred = {12, 34, 78}; truth = {12, 34, 56}
    assert (int(pw["n_pred"]), int(pw["n_truth"]), int(pw["tp"])) == (3, 3, 2)
    assert stats["sweep_thresholds"] == 3
    assert stats["calibration_bins"] >= 2
    # surfaces on disk
    sweep = duckdb.sql(f"SELECT * FROM '{out}/sweep/*.parquet'").df()
    assert len(sweep) == 3
    strat = duckdb.sql(f"SELECT * FROM '{out}/stratified/*.parquet'").df()
    assert set(strat["stratum"]) == {"g1", "g2"}
    cm = duckdb.sql(f"SELECT * FROM '{out}/clusters/*.parquet'").df()
    # predicted clusters split entity C (5,6) -> recall < 1, precision = 1
    assert float(cm["b3_precision"][0]) == 1.0
    assert float(cm["b3_recall"][0]) < 1.0


def test_run_evaluate_cli_minimal(spark, tmp_path, monkeypatch):
    pairs = spark.createDataFrame(
        [(1, 2, 1.0)], "id_rec long, id_mem long, weight double"
    )
    truth = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    pin = str(tmp_path / "p")
    tin = str(tmp_path / "t")
    pairs.write.parquet(pin)
    truth.write.parquet(tin)
    out = str(tmp_path / "o")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _run(
        monkeypatch,
        ["run_evaluate.py", "--pairs", pin, "--truth", tin, "--output", out],
    )
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert float(stats["pairwise"]["f1"]) == 1.0
    assert not os.path.exists(os.path.join(out, "sweep"))


def test_run_match_posterior_feeds_run_evaluate(spark, tmp_path, monkeypatch):
    """--posterior on run_match writes pairs_posterior; run_evaluate's
    calibration leg consumes it directly — the full audit loop in two
    spark-submit steps."""
    from bigmatch_utilities_spark.synthdata import repo_files_df

    records = repo_files_df(spark, seed=7, n_clusters=60)
    inp = str(tmp_path / "records")
    records.write.mode("overwrite").parquet(inp)
    out = str(tmp_path / "match")

    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def _run_job(name, argv):
        monkeypatch.setattr(sys, "argv", argv)
        spec = importlib.util.spec_from_file_location(
            name,
            os.path.join(
                os.path.dirname(os.path.dirname(__file__)), "jobs", f"{name}.py"
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()

    _run_job(
        "run_match",
        [
            "run_match.py",
            "--input", inp,
            "--output", out,
            "--no-minhash",
            "--estimate-mu",
            "--posterior",
            "--fs-rule", "0.01,0.05",
        ],
    )
    fs = spark.read.parquet(f"{out}/fs_rule")
    desig = {r.designation for r in fs.collect()}
    # full 2^K lattice designated; the all-agree top pattern must be a link
    assert fs.count() == 2 ** (len(fs.columns) - 7)
    # this corpus concentrates M-mass near the top, so the lambda budget
    # may leave no nonlink patterns; links must exist and labels be valid
    assert "link" in desig and desig <= {"link", "clerical", "nonlink"}
    top = fs.orderBy(F.desc("weight")).first()
    assert top.designation == "link"
    post = spark.read.parquet(f"{out}/pairs_posterior")
    assert set(post.columns) == {
        "id_rec", "id_mem", "pass_id", "weight", "posterior"
    }
    stats = post.agg(
        F.min("posterior").alias("lo"), F.max("posterior").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0

    # truth from the synthetic labels; feed the calibration leg
    from pyspark.sql import functions as SF

    lab = records.filter(SF.col("true_cluster") >= 0).select(
        "record_id", "true_cluster"
    )
    truth = (
        lab.select("true_cluster", SF.col("record_id").alias("id_l"))
        .join(
            lab.select("true_cluster", SF.col("record_id").alias("id_r")),
            "true_cluster",
        )
        .filter(SF.col("id_l") < SF.col("id_r"))
        .select("id_l", "id_r")
    )
    tin = str(tmp_path / "truth")
    truth.write.parquet(tin)
    evout = str(tmp_path / "eval")
    _run_job(
        "run_evaluate",
        [
            "run_evaluate.py",
            "--pairs", f"{out}/pairs_posterior",
            "--truth", tin,
            "--output", evout,
            "--threshold", "4.0",
            "--posterior-col", "posterior",
        ],
    )
    stats = json.load(open(os.path.join(evout, "stats.json")))
    assert stats["calibration_bins"] >= 1
    # truth covers labeled records only while pred includes boilerplate
    # pairs, so precision is depressed by construction; the loop contract
    # here is plumbing + a sane operating point, not the bench's F1 gate
    assert float(stats["pairwise"]["f1"]) > 0.5
    assert float(stats["pairwise"]["recall"]) > 0.5


def test_run_evaluate_churn_surface(spark, tmp_path, monkeypatch):
    """--clusters-prev adds the churn/ surface with per-category counts."""
    pairs = spark.createDataFrame(
        [(1, 2, 5.0)], "id_rec long, id_mem long, weight double"
    )
    truth = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    curr = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30), (4, 40)], "id long, cluster_id long"
    )
    prev = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, cluster_id long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4)], "id long, label long"
    )
    pp, tp, cp_, vp, lp = (
        str(tmp_path / x) for x in ("p", "t", "c", "v", "l")
    )
    pairs.write.parquet(pp)
    truth.write.parquet(tp)
    curr.write.parquet(cp_)
    prev.write.parquet(vp)
    labels.write.parquet(lp)
    out = str(tmp_path / "out")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _run(
        monkeypatch,
        [
            "run_evaluate.py",
            "--pairs", pp, "--truth", tp, "--output", out,
            "--clusters", cp_, "--labels", lp, "--clusters-prev", vp,
        ],
    )
    stats = json.load(open(f"{out}/stats.json"))
    # cluster 10 merged prev 10+20; 30 stable; 40 is new
    assert stats["churn_merged"] == 1
    assert stats["churn_stable"] == 1
    assert stats["churn_new"] == 1
    cats = {
        r["cluster"]: r["category"]
        for r in spark.read.parquet(f"{out}/churn").collect()
    }
    assert cats == {10: "merged", 30: "stable", 40: "new"}


def test_run_evaluate_triangles_surface(spark, tmp_path, monkeypatch):
    """--triangles writes the per-cluster census and counts chain-shaped
    clusters in stats.json."""
    # cluster 10 = K3 (closed), cluster 11 = path of 3 (chain)
    pairs = spark.createDataFrame(
        [
            (1, 2, 5.0), (2, 3, 5.0), (1, 3, 5.0),
            (4, 5, 5.0), (5, 6, 5.0),
        ],
        "id_rec long, id_mem long, weight double",
    )
    truth = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_l long, id_r long"
    )
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 11), (5, 11), (6, 11)],
        "id long, cluster_id long",
    )
    labels = spark.createDataFrame(
        [(i, "A" if i <= 3 else "B") for i in range(1, 7)],
        "id long, label string",
    )
    pin, tin, cin, lin = (
        str(tmp_path / n) for n in ("pairs", "truth", "clusters", "labels")
    )
    pairs.write.parquet(pin)
    truth.write.parquet(tin)
    clusters.write.parquet(cin)
    labels.write.parquet(lin)
    out = str(tmp_path / "eval")
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    _run(
        monkeypatch,
        [
            "run_evaluate.py",
            "--pairs", pin, "--truth", tin, "--output", out,
            "--clusters", cin, "--labels", lin, "--triangles",
        ],
    )
    stats = json.load(open(f"{out}/stats.json"))
    assert stats["triangles_clusters"] == 2
    assert stats["triangles_chain_shaped"] == 1
    tri = {
        r.cluster_id: (r.n_triangles, r.transitivity)
        for r in spark.read.parquet(f"{out}/triangles").collect()
    }
    assert tri[10] == (1, 1.0)
    assert tri[11] == (0, 0.0)
