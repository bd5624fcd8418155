"""run_fuse CLI: match -> closure -> fuse produces one canonical row per
entity cluster. Runs main() in-process (getOrCreate reuses the test
session), so this tests the real argument wiring without a JVM spawn."""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import functions as F


def test_run_fuse_cli(spark, tmp_path, monkeypatch):
    from bigmatch_utilities_spark.repo_linkage import link_and_cluster
    from bigmatch_utilities_spark.synthdata import repo_files_df

    records = repo_files_df(spark, seed=42, n_clusters=40)
    inp = str(tmp_path / "records")
    records.write.mode("overwrite").parquet(inp)

    clusters = link_and_cluster(spark.read.parquet(inp), use_minhash_pass=False)
    cl = str(tmp_path / "clusters")
    clusters.write.mode("overwrite").parquet(cl)

    out = str(tmp_path / "golden")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_fuse.py",
            "--input", inp,
            "--clusters", cl,
            "--output", out,
            "--id-col", "record_id",
            "--fields", "lang,repo",
        ],
    )
    # keep the shared test session alive: the CLI's spark.stop() must not
    # tear down the fixture (monkeypatch restores stop after the test)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "run_fuse",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "run_fuse.py"),
    )
    rf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rf)
    rf.main()

    got = duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df()
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert len(got) == n_clusters
    assert set(got.columns) == {"cluster_id", "lang", "repo"}
    # every elected value is a real value from the cluster's members
    joined = spark.read.parquet(inp).join(
        spark.read.parquet(cl).select(
            F.col("id").alias("record_id"), "cluster_id"
        ),
        "record_id",
    )
    valid = {
        (r["cluster_id"], r["lang"]) for r in joined.select("cluster_id", "lang").distinct().collect()
    }
    assert all((r.cluster_id, r.lang) in valid for r in got.itertuples())


def test_run_fuse_drop_singletons_and_weight(spark, tmp_path, monkeypatch):
    """--drop-singletons filters size-1 clusters; --weight-col flips an
    election a raw count would decide the other way."""
    records = spark.createDataFrame(
        [
            (1, "py", 0.1),
            (2, "py", 0.1),
            (3, "go", 5.0),   # heavy vote: 'go' beats 2x 'py' when weighted
            (4, "rs", 1.0),   # singleton cluster
        ],
        ["record_id", "lang", "w"],
    )
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)], ["id", "cluster_id"]
    )
    inp, cl = str(tmp_path / "r"), str(tmp_path / "c")
    records.write.parquet(inp)
    clusters.write.parquet(cl)
    out = str(tmp_path / "g")

    import importlib.util
    import os
    import sys

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_fuse.py",
            "--input", inp, "--clusters", cl, "--output", out,
            "--id-col", "record_id", "--fields", "lang",
            "--drop-singletons", "--weight-col", "w",
        ],
    )
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    spec = importlib.util.spec_from_file_location(
        "run_fuse2",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "run_fuse.py"),
    )
    rf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rf)
    rf.main()

    got = {r.cluster_id: r.lang for r in duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df().itertuples()}
    assert got == {10: "go"}  # singleton cluster 20 dropped; weighted winner
