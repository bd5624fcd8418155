"""run_curate CLI end-to-end, plus near_dedup_keep_by survivor election."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.dedup import (
    near_dedup_keep,
    near_dedup_keep_by,
)


def _run(monkeypatch, spark, argv: list[str]) -> None:
    monkeypatch.setattr(sys, "argv", ["run_curate.py"] + argv)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    spec = importlib.util.spec_from_file_location(
        "run_curate",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "jobs", "run_curate.py"
        ),
    )
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)
    rc.main()


_NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_NEAR_B = "alpha beta gamma delta epsilon zeta eta theta iota lambda"


def test_keep_by_elects_highest_priority(spark):
    # docs 10/11 are near-dups; 11 has the higher priority so min-id keep
    # and priority keep disagree on purpose
    df = spark.createDataFrame(
        [(10, _NEAR_A, 0.1), (11, _NEAR_B, 0.9), (12, "totally different words here now", 0.5)],
        "doc_id long, text string, prio double",
    )
    kept_min = {
        r.doc_id
        for r in near_dedup_keep(
            df, "text", "doc_id", shingle_k=3, bands=4, rows_per_band=1,
            threshold=0.5, max_bucket=None,
        ).collect()
    }
    kept_prio = {
        r.doc_id
        for r in near_dedup_keep_by(
            df, "text", "doc_id", "prio", shingle_k=3, bands=4, rows_per_band=1,
            threshold=0.5, max_bucket=None,
        ).collect()
    }
    assert kept_min == {10, 12}
    assert kept_prio == {11, 12}


def test_keep_by_tie_breaks_min_id(spark):
    df = spark.createDataFrame(
        [(20, _NEAR_A, 0.7), (21, _NEAR_B, 0.7)],
        "doc_id long, text string, prio double",
    )
    kept = {
        r.doc_id
        for r in near_dedup_keep_by(
            df, "text", "doc_id", "prio", shingle_k=3, bands=4, rows_per_band=1,
            threshold=0.5, max_bucket=None,
        ).collect()
    }
    assert kept == {20}


def test_run_curate_end_to_end(spark, tmp_path, monkeypatch):
    # corpus: a near-dup pair (one longer/cleaner), a repetitive junk doc,
    # a benchmark-contaminated doc, and clean singles
    bench_text = "the secret benchmark question about ancient rivers and their deltas"
    rows = [
        (1, _NEAR_B),
        (2, _NEAR_A + " zulu yankee"),  # longer near-dup => higher quality
        (3, "spam spam spam spam spam spam spam spam"),          # repetitive
        (4, bench_text + " padded with some surrounding context words"),
        (5, "a perfectly ordinary clean document about compilers and planners"),
        (6, "another ordinary document mentioning query engines and storage"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    bpath = str(tmp_path / "bench")
    spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    ).write.parquet(bpath)
    out = str(tmp_path / "out")

    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--max-dup-frac", "0.5",
            "--threshold", "0.5", "--bands", "8", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--keep-by", "quality",
            "--benchmark", bpath, "--max-contamination", "0.3",
            "--contam-ngram", "5",
        ],
    )

    curated = spark.read.parquet(f"{out}/curated")
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    # 3 dies to the repetition rule; 1 loses the near-dup election to 2
    # (2 is longer => higher quality — min-id keep would have chosen 1);
    # 4 dies to contamination
    assert 3 not in kept and 1 not in kept and 4 not in kept
    assert {2, 5, 6} <= kept
    # split column present and cluster-granular (one split per cluster)
    for r in curated.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("ns")
    ).collect():
        assert r.ns == 1
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    assert stats["input"] == 6
    assert stats["after_filter"] == 5          # repetition filter killed doc 3
    assert stats["after_dedup"] == 4           # near-dup election killed doc 1
    assert stats["after_decontam"] == 3        # contamination killed doc 4
    assert sum(v for k, v in stats.items() if k.startswith("split_")) == 3


def test_run_curate_mixing_stage(spark, tmp_path, monkeypatch):
    rows = [(i, f"unique document number {i} with fully distinct body text words", "en" if i % 2 == 0 else "de") for i in range(40)]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--bands", "4", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--sample-col", "lang", "--sample-rate", "en=0.0",
        ],
    )
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    curated = spark.read.parquet(f"{out}/curated")
    langs = {r.lang for r in curated.select("lang").distinct().collect()}
    assert langs == {"de"}                      # en sampled to zero
    assert stats["after_mix"] == 20 and stats["after_dedup"] == 40


def test_run_curate_scrub_pii_stage(spark, tmp_path, monkeypatch):
    rows = [
        (1, "write to alice@example.com or bob@corp.io for details"),
        (2, "server at 192.168.0.1 answered; ssn 123-45-6789 leaked"),
        (3, "a perfectly ordinary clean document about compilers"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")

    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--threshold", "0.5", "--bands", "4", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--scrub-pii",
        ],
    )

    curated = spark.read.parquet(f"{out}/curated")
    texts = {r.doc_id: r.text for r in curated.collect()}
    assert "<EMAIL>" in texts[1] and "alice@example.com" not in texts[1]
    assert "<IP>" in texts[2] and "<SSN>" in texts[2]
    assert texts[3] == rows[2][1]  # untouched
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    assert stats["pii_email"] == 2
    assert stats["pii_ip"] == 1
    assert stats["pii_ssn"] == 1
    assert stats["input"] == 3


def test_run_curate_span_dedup_stage(spark, tmp_path, monkeypatch):
    """--max-span-dup-frac drops the doc that is mostly verbatim spans of
    OTHER docs, while whole-doc-distinct clean docs survive."""
    boiler = "this exact legal boilerplate paragraph is repeated verbatim everywhere"
    rows = [
        (1, boiler + " plus a lot of unique discussion about parsers and codegen strategies"),
        (2, boiler),  # almost pure boilerplate -> high span dup_frac
        (3, "a clean document with entirely original content on join reordering"),
        (4, "another original document about shuffle partitioning and skew handling"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--max-span-dup-frac", "0.8",
            "--span-k", "8", "--span-w", "4",
            "--threshold", "0.9", "--bands", "4", "--rows-per-band", "2",
            "--max-bucket", "0", "--shard-rows", "0",
        ],
    )
    stats = json.load(open(f"{out}/stats.json"))
    assert stats["input"] == 4
    assert stats["after_span_dedup"] == 3  # doc 2 dropped
    kept = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/curated").select("doc_id").collect()
    }
    assert 2 not in kept and {1, 3, 4} <= kept


def test_run_curate_ppl_stage(spark, tmp_path, monkeypatch):
    """--ppl-keep head,middle drops the worst-perplexity tertile (the
    transition-breaking noise docs) and records after_ppl_filter."""
    rows = []
    for i in range(8):
        rows.append(
            (i, "the quick brown fox jumps over the lazy dog near the river bank")
        )
    for i in range(4):
        rows.append((100 + i, f"zq{i}xj qzxw jqzv wxqz kqjz vqxzw zzqq xqzw"))
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--ppl-keep", "head,middle",
            "--threshold", "0.9", "--bands", "4", "--rows-per-band", "2",
            "--max-bucket", "0", "--shard-rows", "0",
        ],
    )
    stats = json.load(open(f"{out}/stats.json"))
    assert stats["input"] == 12
    assert stats["after_ppl_filter"] == 8  # the 12-doc tail tertile = noise
    kept = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/curated").select("doc_id").collect()
    }
    assert all(k < 100 for k in kept)


def test_run_curate_ppl_keep_validates(spark, tmp_path, monkeypatch):
    import pytest

    inp = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    ).write.parquet(inp)
    with pytest.raises(SystemExit):
        _run(
            monkeypatch,
            spark,
            ["--input", inp, "--output", str(tmp_path / "o"),
             "--ppl-keep", "head,bogus"],
        )


def test_run_curate_license_gate(spark, tmp_path, monkeypatch):
    """--drop-licenses removes copyleft files before any shuffle stage."""
    rows = [
        (1, "useful permissive code Licensed under the Apache License, Version 2.0"),
        (2, "copyleft file under the GNU General Public License ... version 3 terms"),
        (3, "plain unlicensed code with no header at all present here"),
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--drop-licenses", "GPL-3.0,GPL-2.0",
            "--threshold", "0.9", "--bands", "4", "--rows-per-band", "2",
            "--max-bucket", "0", "--shard-rows", "0",
        ],
    )
    stats = json.load(open(f"{out}/stats.json"))
    assert stats["after_license_filter"] == 2
    kept = {
        r.doc_id
        for r in spark.read.parquet(f"{out}/curated").select("doc_id").collect()
    }
    assert kept == {1, 3}


def test_run_curate_quota_stage(spark, tmp_path, monkeypatch):
    rows = [
        (i, f"unique document number {i} with fully distinct body text words",
         "big" if i < 30 else "small")
        for i in range(36)
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--bands", "4", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--max-per-domain", "5",
        ],
    )
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    curated = spark.read.parquet(f"{out}/curated")
    per = {r.source: r.n for r in curated.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["big"] == 5 and per["small"] == 5
    assert stats["after_quota"] == 10


def test_run_curate_dsir_stage(spark, tmp_path, monkeypatch):
    raw_rows = [
        (i, "spark shuffle partition join broadcast agg" if i % 2 == 0
         else "llama alpaca vicuna gecko marmot wombat")
        for i in range(30)
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(raw_rows, "doc_id long, text string").write.parquet(inp)
    tgt = str(tmp_path / "target")
    spark.createDataFrame(
        [(100, "spark join shuffle agg broadcast partition")],
        "doc_id long, text string",
    ).write.parquet(tgt)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--bands", "4", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--threshold", "1.01",  # keep every doc through near-dedup
            "--dsir-target", tgt, "--dsir-keep", "10",
            "--dsir-buckets", "256",
        ],
    )
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    curated = spark.read.parquet(f"{out}/curated")
    kept = sorted(r.doc_id for r in curated.select("doc_id").collect())
    assert stats["after_dsir"] == 10
    assert all(i % 2 == 0 for i in kept), kept


def test_run_curate_line_dedup_stage(spark, tmp_path, monkeypatch):
    footer = "all rights reserved by example corp"
    rows = [
        (i, f"unique document body number {i} with distinct words\n{footer}")
        for i in range(12)
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(inp)
    out = str(tmp_path / "out")
    _run(
        monkeypatch,
        spark,
        [
            "--input", inp, "--output", out,
            "--bands", "4", "--rows-per-band", "1",
            "--max-bucket", "0", "--shard-rows", "0",
            "--threshold", "1.01",
            "--line-dedup-min-df", "10",
        ],
    )
    with open(f"{out}/stats.json") as fh:
        stats = json.load(fh)
    curated = spark.read.parquet(f"{out}/curated")
    texts = [r.text for r in curated.collect()]
    assert stats["lines_removed"] == 12
    assert all(footer not in t for t in texts)
    assert all(t.startswith("unique document body") for t in texts)
