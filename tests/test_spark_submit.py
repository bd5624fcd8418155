"""North-rule deployment evidence: the pipeline really ships as
`spark-submit --py-files <zip> jobs/run_match.py` (BASELINE.json
north_star / north_rule: "ships as spark-submit --py-files jobs").

The submit runs from a NEUTRAL working directory with the repo absent
from PYTHONPATH, so the bigmatch_utilities_spark package can only come
from the --py-files archive — a cwd of /root/repo would let the local
package shadow the zip and prove nothing.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not found"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    zip_path = str(tmp_path / "bigmatch_utilities_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_path],
        check=True,
        capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000

    # small deterministic input written by the test session
    from bigmatch_utilities_spark.synthdata import repo_files_df

    inp = str(tmp_path / "input")
    repo_files_df(spark, seed=42, n_clusters=60).write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "run_match.py"),
            "--input",
            inp,
            "--output",
            out,
            "--checkpoint",
            ckpt,
            "--no-minhash",
        ],
        cwd=str(tmp_path),  # neutral cwd: '.' on sys.path is NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the job wrote real pairs, resumable markers, and a good_pairs split
    n_good = duckdb.sql(
        f"SELECT count(*) FROM '{out}/good_pairs/*.parquet'"
    ).fetchone()[0]
    assert n_good > 0
    markers = os.listdir(os.path.join(ckpt, "markers"))
    assert any(m.startswith("pass_") for m in markers)
