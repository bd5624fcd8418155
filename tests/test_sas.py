"""S4 SAS ingest: Spark plumbing tested via an injected deterministic
decoder (no .sas7bdat fixture exists in this container and pandas cannot
write one); the pandas.read_sas integration path runs only when a real file
is present. Reference behavior: /root/reference/app/ConvertFile.py:114-122."""

from __future__ import annotations

import pytest

from bigmatch_utilities_spark.sources import sas


fake_read_sas = sas.deterministic_fake_reader


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
