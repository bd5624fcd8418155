"""Legacy pairs-file emitter format tests (FIXTURES.md F6) + RDBMS
source/sink behavior."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.config import parse_datadict, parse_parmf, DictField
from bigmatch_utilities_spark.emit import (
    SECTION_LINE,
    combine_pairs_text,
    good_pairs_row,
    pairs_row,
    segment_compare,
    write_pairs_file,
)
from bigmatch_utilities_spark.operators.pipeline import normalize, score_pass
from bigmatch_utilities_spark.sources.fixed_width import read_fixed_width
from bigmatch_utilities_spark.sources.rdbms import (
    guarded_select,
    list_tables,
    load_table,
    spark_type_for,
)

GS = "/root/reference/samplefiles/gs"


@pytest.fixture(scope="module")
def scored(spark):
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
    spec = cfg.passes[1]
    return spec, score_pass(rec, mem, spec, 1, "id")


def test_pairs_row_grammar(spark, scored):
    """Rows must parse back under the reference grammar: weight first,
    '?   ~' separator, '~' splitting rec/mem match-value halves."""
    spec, df = scored
    rows = [r["value"] for r in df.select(pairs_row(spec).alias("value")).collect()]
    assert rows
    for row in rows:
        assert "?   ~" in row
        head, tail = row.split("?   ~", 1)
        toks = head.split()
        float(toks[0])  # weight parses
        assert len(toks) >= 3 + len(spec.block_fields)
        halves = tail.split("~")
        assert len(halves) == 2  # rec half ~ mem half


def test_pairs_file_written_weight_desc(spark, scored, tmp_path):
    spec, df = scored
    out = str(tmp_path / "pairs00")
    write_pairs_file(df, spec, out, pass_id=1)
    lines = [
        r["value"]
        for r in spark.read.text(out).collect()
    ]
    weights = [float(line.split()[0]) for line in lines]
    assert weights == sorted(weights, reverse=True)


def test_combined_file_sections(spark, scored):
    spec, df = scored
    combined = combine_pairs_text([(1, df, spec)]).collect()
    vals = [r["value"] for r in combined]
    assert vals[-1] == SECTION_LINE
    assert all(v.startswith("bp:01") for v in vals[:-1])


def test_good_pairs_row_layout(spark):
    df = spark.createDataFrame(
        [(2, 12.3456, "17", "9")], ["pass_id", "weight", "id_rec", "id_mem"]
    )
    row = df.select(good_pairs_row().alias("v")).collect()[0]["v"]
    toks = row.split()
    assert toks[0] == "2" and toks[1] == "12.346"
    assert toks[2] == "17" and toks[3] == "9"


def test_segment_compare(spark):
    df = spark.createDataFrame([("JOHN Q SMITH", "john x smith")], ["a", "b"])
    out = df.select(segment_compare(F.col("a"), F.col("b")).alias("s")).collect()[0]["s"]
    assert [x["same"] for x in out] == [True, False, True]


# ---------------------------------------------------------------------------
# RDBMS
# ---------------------------------------------------------------------------


def test_guarded_select_allows_select(spark):
    spark.createDataFrame([(1, "a")], ["k", "v"]).createOrReplaceTempView("g_t1")
    assert guarded_select(spark, "SELECT k FROM g_t1").count() == 1
    assert guarded_select(spark, "  with c as (select 1 as x) select * from c ").count() == 1


@pytest.mark.parametrize(
    "bad",
    [
        "DROP TABLE g_t1",
        "insert into g_t1 values (2, 'b')",
        "SELECT 1; DROP TABLE g_t1",
        "update g_t1 set v='x'",
        "EXPLAIN SELECT 1",
    ],
)
def test_guarded_select_rejects(spark, bad):
    with pytest.raises(ValueError):
        guarded_select(spark, bad)


def test_type_mapping():
    assert spark_type_for(DictField("a", 1, 1, data_format="int")) == "long"
    assert spark_type_for(DictField("a", 1, 1, data_format="date")) == "string"
    assert spark_type_for(DictField("a", 1, 1)) == "string"


def test_load_table_and_list(spark):
    df = spark.createDataFrame([("1", "x"), ("2", "y")], ["k", "v"])
    fields = [DictField("k", 1, 4, data_format="int"), DictField("v", 5, 4)]
    load_table(spark, df, "g_loaded", fields)
    assert "g_loaded" in list_tables(spark)
    back = spark.table("g_loaded")
    assert dict(back.dtypes)["k"] == "bigint"
    assert back.count() == 2


# ---------------------------------------------------------------------------
# SQLite ingest (reference store: samplefiles/sample.db,
# app/RDBMS_Read_Export_UI.py:139-221)
# ---------------------------------------------------------------------------

SAMPLE_DB = "/root/reference/samplefiles/sample.db"


def test_read_sqlite_reference_sample_db(spark):
    from bigmatch_utilities_spark.sources.rdbms import (
        list_sqlite_tables,
        read_sqlite,
    )

    assert "sample" in list_sqlite_tables(SAMPLE_DB)
    df = read_sqlite(spark, SAMPLE_DB, table="sample")
    assert df.columns == ["fname", "mname", "lname", "race", "gender", "dob"]
    assert df.count() == 35
    row = df.filter(F.col("lname") == "EDISON").collect()[0]
    assert row["fname"] == "THOMAS" and row["dob"] == "19660607"


def test_read_sqlite_empty_table_keeps_schema(spark):
    from bigmatch_utilities_spark.sources.rdbms import read_sqlite

    df = read_sqlite(spark, SAMPLE_DB, table="sample_fixed_width")
    assert df.count() == 0
    assert df.columns == ["fname", "mname", "lname", "race", "gender", "dob"]


def test_read_sqlite_query_guard(spark):
    from bigmatch_utilities_spark.sources.rdbms import read_sqlite

    got = read_sqlite(
        spark, SAMPLE_DB, query="SELECT fname, lname FROM sample WHERE gender = 'F'"
    )
    assert got.columns == ["fname", "lname"] and got.count() > 0
    for bad in ("DROP TABLE sample", "DELETE FROM sample", "SELECT 1; SELECT 2"):
        with pytest.raises(ValueError):
            read_sqlite(spark, SAMPLE_DB, query=bad)
    with pytest.raises(ValueError):
        read_sqlite(spark, SAMPLE_DB, table="sample; drop")


def test_sqlite_to_fixed_width_export_roundtrip(spark, tmp_path):
    """The reference UI flow: sample.db SELECT → padded flat file
    (app/RDBMS_Read_Export_UI.py:223-241), re-parsed by our own reader."""
    from bigmatch_utilities_spark.sources.fixed_width import read_fixed_width
    from bigmatch_utilities_spark.sources.rdbms import (
        export_query_to_fixed_width,
        read_sqlite,
    )

    read_sqlite(spark, SAMPLE_DB, table="sample").createOrReplaceTempView(
        "sqlite_sample"
    )
    fields = [
        DictField(name="fname", start_pos=1, width=16),
        DictField(name="lname", start_pos=17, width=20),
        DictField(name="dob", start_pos=37, width=8),
    ]
    out = str(tmp_path / "sample_fw.txt")
    export_query_to_fixed_width(
        spark,
        "SELECT fname, lname, dob FROM sqlite_sample ORDER BY lname, fname",
        out,
        fields,
    )
    back = read_fixed_width(spark, out, fields)
    assert back.count() == 35
    ed = back.filter(F.col("lname") == "EDISON").collect()[0]
    assert ed["fname"] == "THOMAS" and ed["dob"] == "19660607"


def test_read_sqlite_dir_parallel(spark, tmp_path):
    """Executor-side decode across a fleet of SQLite files."""
    import sqlite3

    from bigmatch_utilities_spark.sources.rdbms import read_sqlite_dir

    paths = []
    for i in range(3):
        p = str(tmp_path / f"part{i}.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [(i * 10 + j, f"row{i}_{j}") for j in range(5)],
        )
        con.commit()
        con.close()
        paths.append(p)
    df = read_sqlite_dir(spark, paths, "t", "id long, name string")
    assert df.count() == 15
    assert df.agg(F.sum("id")).collect()[0][0] == sum(
        i * 10 + j for i in range(3) for j in range(5)
    )


def test_signed_weight_rows_byte_compat(spark, scored):
    """signed=True prints '+' on positive weights exactly as raw engine
    output does; the reference parser strips it (MatchReview.py:198-202),
    so signed and unsigned rows parse to identical records."""
    spec, df = scored
    signed_rows = [
        r["value"]
        for r in df.select(pairs_row(spec, signed=True).alias("value")).collect()
    ]
    plain_rows = [
        r["value"] for r in df.select(pairs_row(spec).alias("value")).collect()
    ]
    assert signed_rows
    saw_plus = False
    for s_row in signed_rows:
        w = s_row.split()[0]
        assert w[0] in "+-"  # every weight carries an explicit sign
        saw_plus = saw_plus or w[0] == "+"
    assert saw_plus
    # byte-identical golden: strip-sign(signed) == unsigned, line for line
    assert sorted(r.replace("+", "", 1) if r.split()[0][0] == "+" else r for r in signed_rows) == sorted(plain_rows)
