"""--standardize in jobs/run_match.py: nickname canonicalization inside
the linkage plan recovers pairs a plain `c` comparator loses (the
BILL↔WILLIAM case), end-to-end through the real CLI wiring."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
from pyspark.sql import functions as F


def _run_match_main(spark, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["run_match.py", *argv])
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    spec = importlib.util.spec_from_file_location(
        "run_match_cli",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "jobs", "run_match.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


def _nickname_input(spark, path):
    """Two near-identical 'repo files' whose ONLY difference is a nickname
    ('bill' vs 'william') in the ANCHOR line — the blocking key of the
    fuzzy pass. Raw: different anchors, no block, pair lost (contents
    differ, so the hash passes can't catch it either). Standardized:
    anchors agree, the pass blocks them, head/tail JW accepts."""
    body = "\n".join(f"common line {i} shared by both" for i in range(12))
    a = "shared header line\n" + body + "\nmaintained by bill"
    b = "shared header line\n" + body + "\nmaintained by william"
    filler = [
        (
            f"r{i}",
            f"src/f{i}.py",
            f"c{i}",
            "py",
            f"unique document {i} " + " ".join(f"tok{i}_{j}" for j in range(30)),
        )
        for i in range(6)
    ]
    rows = [
        ("repoA", "src/x.py", "c1", "py", a),
        ("repoB", "src/y.py", "c2", "py", b),
        *filler,
    ]
    df = spark.createDataFrame(rows, ["repo", "path", "commit", "lang", "content"])
    df.write.mode("overwrite").parquet(path)


def test_standardize_recovers_nickname_pair(spark, tmp_path, monkeypatch):
    inp = str(tmp_path / "input")
    _nickname_input(spark, inp)

    def good_pairs(out):
        return {
            (min(r.id_rec, r.id_mem), max(r.id_rec, r.id_mem))
            for r in duckdb.sql(
                f"SELECT id_rec, id_mem FROM '{out}/good_pairs/*.parquet'"
            ).df().itertuples()
        }

    # ids are deterministic (with_record_id): find the two planted rows'
    # record ids via the content marker
    prep = spark.read.parquet(inp)
    from bigmatch_utilities_spark.repo_linkage import prepare

    ids = {
        r["repo"]: r["record_id"]
        for r in prepare(prep).select("repo", "record_id").collect()
    }
    planted = (min(ids["repoA"], ids["repoB"]), max(ids["repoA"], ids["repoB"]))

    out_raw = str(tmp_path / "out_raw")
    _run_match_main(
        spark, monkeypatch,
        ["--input", inp, "--output", out_raw, "--no-minhash"],
    )
    assert planted not in good_pairs(out_raw), (
        "fixture broken: the nickname pair should be lost without "
        "standardization"
    )

    out_std = str(tmp_path / "out_std")
    _run_match_main(
        spark, monkeypatch,
        ["--input", inp, "--output", out_std, "--no-minhash",
         "--standardize", "anchor_line"],
    )
    assert planted in good_pairs(out_std)


def test_standardize_mapfile_and_join_path(spark, tmp_path, monkeypatch):
    """A MAPFILE drives the canonicalization; a map larger than
    STANDARDIZE_EXPR_MAX exercises the broadcast-join path with identical
    results."""
    inp = str(tmp_path / "input")
    _nickname_input(spark, inp)

    mapfile = tmp_path / "syn.csv"
    mapfile.write_text("token,canonical\nbill,william\n")

    out_a = str(tmp_path / "out_a")
    _run_match_main(
        spark, monkeypatch,
        ["--input", inp, "--output", out_a, "--no-minhash",
         "--standardize", f"anchor_line:{mapfile}"],
    )

    # pad the map past the expr/join threshold with inert entries
    big = tmp_path / "big.csv"
    pad = "\n".join(f"zzpad{i},zzpad{i}x" for i in range(600))
    big.write_text("token,canonical\nbill,william\n" + pad + "\n")
    out_b = str(tmp_path / "out_b")
    _run_match_main(
        spark, monkeypatch,
        ["--input", inp, "--output", out_b, "--no-minhash",
         "--standardize", f"anchor_line:{big}"],
    )

    pa = duckdb.sql(
        f"SELECT id_rec, id_mem, pass_id FROM '{out_a}/pairs/**/*.parquet' ORDER BY 1,2,3"
    ).fetchall()
    pb = duckdb.sql(
        f"SELECT id_rec, id_mem, pass_id FROM '{out_b}/pairs/**/*.parquet' ORDER BY 1,2,3"
    ).fetchall()
    assert pa == pb and len(pa) > 0
