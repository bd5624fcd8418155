"""Fixed-width source/sink tests over the reference's own sample files."""

from __future__ import annotations

from pathlib import Path

from bigmatch_utilities_spark.config import parse_datadict
from bigmatch_utilities_spark.sources.fixed_width import (
    csv_to_fixed_width,
    infer_widths,
    read_fixed_width,
    write_fixed_width,
)

GS = "/root/reference/samplefiles/gs"


def _fields(dict_path: str):
    return parse_datadict(Path(dict_path).read_text())


def test_read_rec_sample(spark):
    fields = _fields(f"{GS}/sample_fixed_width.dict.csv")
    df = read_fixed_width(spark, f"{GS}/sample_fixedwidth.txt", fields)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 35
    r1 = rows["1"]
    assert r1["fname"] == "THOMAS"
    assert r1["mname"] == "ALVA"
    assert r1["lname"] == "EDISON"
    assert r1["race"] == "W" and r1["gender"] == "M" and r1["dob"] == "19660607"


def test_read_mem_sample_blanks(spark):
    fields = _fields(f"{GS}/sample2_fixed_width.dict.csv")
    df = read_fixed_width(spark, f"{GS}/sample2_fixedwidth.txt", fields)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 37
    # perturbations: TOM vs THOMAS, blank dob/race (blanks normalize to '')
    r1 = rows["1"]
    assert r1["fname"] == "TOM" and r1["lname"] == "EDISON"
    assert r1["dob"] == "" and r1["race"] == "W"
    assert rows["2"]["race"] == ""


def test_write_round_trip(spark, tmp_path):
    fields = _fields(f"{GS}/sample_fixed_width.dict.csv")
    df = read_fixed_width(spark, f"{GS}/sample_fixedwidth.txt", fields)
    out = str(tmp_path / "out_fw")
    write_fixed_width(df, out, fields)
    again = read_fixed_width(spark, out, fields)
    assert sorted(df.collect()) == sorted(again.collect())


def test_infer_widths_and_csv_convert(spark, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("a,b\nxx,1\nyyyy,22\n,333\n")
    df = spark.read.csv(str(csv), header=True)
    w = infer_widths(df)
    assert w == {"a": 4, "b": 3}
    out = str(tmp_path / "fw")
    fields = csv_to_fixed_width(spark, str(csv), out)
    assert [(f.name, f.start_pos, f.width) for f in fields] == [
        ("a", 1, 4),
        ("b", 5, 3),
    ]
    back = read_fixed_width(spark, out, fields)
    got = sorted((r["a"], r["b"]) for r in back.collect())
    assert got == [("", "333"), ("xx", "1"), ("yyyy", "22")]
