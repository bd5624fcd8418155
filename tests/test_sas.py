"""S4 SAS ingest, two layers:

* REAL BYTES: genuine sas7bdat fixtures (tests/fixtures/*.sas7bdat,
  produced by tools/make_sas7bdat.py — a from-scratch writer for the
  publicly documented format) decoded by the actual pandas.read_sas path;
* plumbing: the injected deterministic decoder exercises chunking /
  parallel-decode wiring independently of the binary format.

Reference behavior: /root/reference/app/ConvertFile.py:114-122."""

from __future__ import annotations

import os

import pytest

from bigmatch_utilities_spark.sources import sas

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PEOPLE = os.path.join(FIXTURES, "people.sas7bdat")
WIDE = os.path.join(FIXTURES, "wide.sas7bdat")

fake_read_sas = sas.deterministic_fake_reader


# ---------------------------------------------------------------------------
# real sas7bdat bytes through the default pandas.read_sas decoder
# ---------------------------------------------------------------------------


def test_read_sas_real_file(spark):
    df = sas.read_sas(spark, PEOPLE)
    assert df.columns == ["NAME", "CITY", "VALUE", "COUNT"]
    rows = {r["NAME"]: r for r in df.collect()}
    assert len(rows) == 25
    assert rows["person_003"]["CITY"] == "SPRINGFIELD"  # bytes → str decode
    assert rows["person_003"]["VALUE"] == pytest.approx(4.75)
    assert rows["person_010"]["COUNT"] == pytest.approx(100.0)


def test_read_sas_real_file_chunked_multipage(spark):
    """600 rows span multiple 8 KiB data pages; chunked decode (100-row
    chunks) must still reassemble every row exactly once."""
    df = sas.read_sas(spark, WIDE, chunksize=100)
    assert df.count() == 600
    got = df.agg({"ID": "sum", "SCORE": "sum"}).collect()[0]
    assert got["sum(ID)"] == pytest.approx(sum(range(600)))
    assert got["sum(SCORE)"] == pytest.approx(sum(i * 0.125 for i in range(600)))


def test_read_sas_dir_real_files(spark):
    df = sas.read_sas_dir(
        spark,
        [PEOPLE, PEOPLE],
        "NAME string, CITY string, VALUE double, COUNT double",
    )
    assert df.count() == 50  # decoded one-file-per-task


def test_sas_to_text_real_file(spark, tmp_path):
    """The reference's SAS → header + tab-delimited conversion on real
    bytes (ConvertFile.py:114-122 semantics)."""
    out = tmp_path / "people.txt"
    n = sas.sas_to_text(spark, PEOPLE, str(out))
    lines = out.read_text().splitlines()
    assert n == 25 and len(lines) == 26
    assert lines[0] == "NAME\tCITY\tVALUE\tCOUNT"
    body = {ln.split("\t")[0]: ln.split("\t") for ln in lines[1:]}
    assert body["person_001"][1] == "RIVERTON"
    assert float(body["person_001"][2]) == pytest.approx(1.75)


# ---------------------------------------------------------------------------
# plumbing via the injected decoder (format-independent)
# ---------------------------------------------------------------------------


def test_read_sas_decodes_and_chunks(spark):
    df = sas.read_sas(
        spark, "/fake/x.sas7bdat", chunksize=4, reader=fake_read_sas
    )
    rows = sorted(df.collect(), key=lambda r: r["NAME"])
    assert len(rows) == 7
    assert rows[0]["NAME"] == "row0"  # bytes → str
    assert rows[3]["VALUE"] == pytest.approx(4.5)


def test_read_sas_dir_parallel(spark):
    df = sas.read_sas_dir(
        spark,
        ["/fake/a.sas7bdat", "/fake/b.sas7bdat"],
        "NAME string, VALUE double",
        reader=fake_read_sas,
    )
    assert df.count() == 14  # 7 rows per file, one task per file


def test_sas_to_text_legacy_format(spark, tmp_path):
    out = tmp_path / "calcmilk.txt"
    n = sas.sas_to_text(
        spark, "/fake/a.sas7bdat", str(out), reader=fake_read_sas
    )
    lines = out.read_text().splitlines()
    assert n == 7
    assert lines[0] == "NAME\tVALUE"
    assert lines[1].startswith("row") and "\t" in lines[1]
