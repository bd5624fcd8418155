"""suggest_keys CLI: the pre-flight blocking-key design table as a job."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb


def test_suggest_keys_cli(spark, tmp_path, monkeypatch):
    from bigmatch_utilities_spark.repo_linkage import prepare
    from bigmatch_utilities_spark.synthdata import repo_files_df, true_pairs_pdf

    records = repo_files_df(spark, seed=42, n_clusters=50)
    inp = str(tmp_path / "records")
    prepare(records).write.parquet(inp)
    truth_path = str(tmp_path / "truth")
    spark.createDataFrame(
        sorted(true_pairs_pdf(records.toPandas())), ["id_rec", "id_mem"]
    ).write.parquet(truth_path)
    out = str(tmp_path / "table")

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "suggest_keys.py",
            "--input", inp,
            "--keys", "content_sha;lang,anchor_line;lang",
            "--truth", truth_path,
            "--id-col", "record_id",
            "--output", out,
        ],
    )
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    spec = importlib.util.spec_from_file_location(
        "suggest_keys",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "jobs", "suggest_keys.py"
        ),
    )
    sk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sk)
    sk.main()

    got = duckdb.sql(f"SELECT * FROM '{out}/*.parquet'").df()
    assert set(got.key_set) == {"content_sha", "lang,anchor_line", "lang"}
    assert {"cand_pairs", "reduction_ratio", "pairs_completeness"} <= set(
        got.columns
    )
    by = {r.key_set: r for r in got.itertuples()}
    # the designed pass-2 key dominates the design table: more recall than
    # the exact hash, far fewer candidates than the lang mega-blocks
    assert by["lang,anchor_line"].pairs_completeness > by["content_sha"].pairs_completeness
    assert by["lang,anchor_line"].cand_pairs < by["lang"].cand_pairs
