"""run_dedup CLI: the winnow (containment) method end-to-end, plus the
exact method's group output. The asymmetric case that motivates winnow:
a paragraph copied VERBATIM into a much larger document scores high
containment (and clusters) even though whole-document Jaccard is low."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb


def _run(monkeypatch, spark, argv: list[str]) -> None:
    monkeypatch.setattr(sys, "argv", ["run_dedup.py"] + argv)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    spec = importlib.util.spec_from_file_location(
        "run_dedup",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "jobs", "run_dedup.py"
        ),
    )
    rd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rd)
    rd.main()


def test_run_dedup_winnow_containment(spark, tmp_path, monkeypatch):
    para = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under the harvest moon and nobody notices the time"
    )
    filler = " ".join(f"unrelated sentence number {i} with distinct words" for i in range(40))
    docs = [
        (1, para),                       # the original paragraph
        (2, para + " " + filler),        # paragraph embedded in a big doc
        (3, "completely different content about spark physical plans " * 6),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(inp)
    out = str(tmp_path / "out")

    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--method", "winnow", "--threshold", "0.5",
            "--max-bucket", "0", "--shard-rows", "0",
        ],
    )

    cands = duckdb.sql(f"SELECT * FROM '{out}/candidates/*.parquet'").df()
    assert {"id_l", "id_r", "shared", "containment"} <= set(cands.columns)
    ver = duckdb.sql(f"SELECT * FROM '{out}/verified/*.parquet'").df()
    assert [(r.id_l, r.id_r) for r in ver.itertuples()] == [(1, 2)]
    # whole-document containment of the copied paragraph stays high even
    # though doc 2 is much larger (the asymmetric score)
    assert ver.containment[0] >= 0.9
    clusters = duckdb.sql(f"SELECT * FROM '{out}/clusters/*.parquet'").df()
    assert set(
        clusters[clusters.cluster_id == clusters.cluster_id.min()].id
    ) == {1, 2}


def test_run_dedup_exact_groups(spark, tmp_path, monkeypatch):
    docs = [(1, "same text"), (2, "same text"), (3, "other")]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(docs, ["doc_id", "text"]).write.parquet(inp)
    out = str(tmp_path / "out")
    _run(monkeypatch, spark, ["--input", inp, "--output", out, "--method", "exact"])
    dups = duckdb.sql(f"SELECT * FROM '{out}/duplicates/*.parquet'").df()
    assert len(dups) >= 1
    row = dups.sort_values("n_dups", ascending=False).iloc[0]
    assert row.n_dups == 2 and row.keep_id == 1


def test_run_dedup_semdedup_method(spark, tmp_path, monkeypatch):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),     # semantic dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    inp = str(tmp_path / "emb")
    spark.createDataFrame(
        rows, "doc_id long, embedding array<float>"
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--method", "semdedup", "--threshold", "0.99",
            "--id-col", "doc_id", "--n-cells", "2",
            "--max-bucket", "0", "--shard-rows", "0",
        ],
    )
    kept = duckdb.sql(f"SELECT * FROM '{out}/kept/*.parquet'").df()
    assert set(kept.columns) == {"doc_id", "cell"}
    assert 2 not in set(kept.doc_id) and {1, 3, 4} <= set(kept.doc_id)
