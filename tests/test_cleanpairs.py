"""cleanpairs keys.dat compat: byte-golden against the reference's own
shell script (/root/reference/cleanpairs) run on our emitted pairs files."""

from __future__ import annotations

import subprocess
from pathlib import Path

import pytest

from bigmatch_utilities_spark.config import parse_datadict, parse_parmf
from bigmatch_utilities_spark.emit import (
    cleanpairs_keys,
    pairs_row,
    write_cleanpairs_keys,
)
from bigmatch_utilities_spark.operators.pipeline import normalize, score_pass
from bigmatch_utilities_spark.sources.fixed_width import read_fixed_width

GS = "/root/reference/samplefiles/gs"
CLEANPAIRS = "/root/reference/cleanpairs"


@pytest.fixture(scope="module")
def per_pass(spark):
    cfg = parse_parmf(Path(f"{GS}/parmf.txt").read_text())
    rec = normalize(
        read_fixed_width(
            spark, f"{GS}/sample_fixedwidth.txt",
            parse_datadict(Path(f"{GS}/sample_fixed_width.dict.csv").read_text()),
        )
    )
    mem = normalize(
        read_fixed_width(
            spark, f"{GS}/sample2_fixedwidth.txt",
            parse_datadict(Path(f"{GS}/sample2_fixed_width.dict.csv").read_text()),
        )
    )
    return [
        (k, score_pass(rec, mem, spec, k, "id"), spec)
        for k, spec in enumerate(cfg.passes)
    ]


def test_keys_dat_byte_identical_to_reference_script(per_pass, tmp_path):
    # emit the per-pass Pairs files the reference engine would have left
    # behind (order irrelevant: the script re-sorts with `sort -r`)
    for pass_id, df, spec in per_pass:
        lines = [
            r["value"] for r in df.select(pairs_row(spec).alias("value")).collect()
        ]
        (tmp_path / f"mem-recPairs_{pass_id:02d}.dat").write_text(
            "".join(line + "\n" for line in lines)
        )
    # the reference's own pipeline, byte-for-byte (LC_ALL=C pins sort -r)
    subprocess.run(
        ["sh", CLEANPAIRS, "mem", "rec"],
        cwd=tmp_path,
        input=f"{len(per_pass)}\n",
        text=True,
        check=True,
        capture_output=True,
        env={"PATH": "/usr/bin:/bin", "LC_ALL": "C"},
    )
    expected = (tmp_path / "keys.dat").read_bytes()

    ours = tmp_path / "keys_spark.dat"
    write_cleanpairs_keys(per_pass, str(ours))
    assert ours.read_bytes() == expected
    assert expected  # non-trivial golden


def test_keys_rows_shape(per_pass):
    keys = cleanpairs_keys(per_pass[:2])
    rows = keys.collect()
    assert rows and keys.columns == ["pass_id", "value"]
    for r in rows:
        assert r["value"].endswith(f" Pass_{r['pass_id']}")
        body = r["value"][: -len(f" Pass_{r['pass_id']}")]
        assert len(body) <= 28
    # passes appear in order; within a pass, byte-descending
    tags = [r["pass_id"] for r in rows]
    assert tags == sorted(tags)
    for pid in set(tags):
        vals = [r["value"] for r in rows if r["pass_id"] == pid]
        assert vals == sorted(vals, reverse=True)
