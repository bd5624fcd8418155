"""Text-analysis operator tests + Spark↔DuckDB SQL twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.textanalysis import (
    analyze_documents,
    detected_lang,
    detected_lang_sql,
    fingerprint,
    fingerprint_sql,
    quality_score,
    quality_score_sql,
    token_count,
    token_count_sql,
)

DOCS = [
    (1, "The quick brown fox and the lazy dog went to the market, it is said."),
    (2, "Der Hund und die Katze sind nicht das Problem, ist doch klar."),
    (3, "Le chat et le chien sont les meilleurs amis est une idée."),
    (4, "xz qq zz 9 9 9"),
    (5, ""),
    (6, "El perro y el gato que viven en la casa de los abuelos es grande."),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_count(spark):
    got = {
        r["doc_id"]: r["n"]
        for r in _docs(spark).select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    assert got[1] == 15
    assert got[5] == 0


def test_detected_lang(spark):
    got = {
        r["doc_id"]: r["l"]
        for r in _docs(spark)
        .select("doc_id", detected_lang(F.col("text")).alias("l"))
        .collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[6] == "es"
    assert got[4] == "und"
    assert got[5] == "und"


def test_sql_twins_match(spark):
    """Every operator's DuckDB rendering returns identical values — the
    contract the driver's oracle check relies on."""
    df = _docs(spark)
    got = df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        detected_lang(F.col("text")).alias("lang_detected"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    ).toPandas().set_index("doc_id").sort_index()

    con = duckdb.connect()
    con.register("t", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = con.sql(
        f"""select doc_id,
            {token_count_sql('text')} as n_tokens,
            {detected_lang_sql('text')} as lang_detected,
            {quality_score_sql('text')} as quality,
            {fingerprint_sql('text')} as fp
        from t"""
    ).df().set_index("doc_id").sort_index()

    assert list(got["n_tokens"]) == list(want["n_tokens"])
    assert list(got["lang_detected"]) == list(want["lang_detected"])
    assert list(got["fp"]) == list(want["fp"])
    for g, w in zip(got["quality"], want["quality"]):
        assert abs(g - w) < 1e-9


def test_analyze_documents_schema(spark):
    out = analyze_documents(_docs(spark), "text")
    assert set(out.columns) == {
        "doc_id", "text", "n_tokens", "lang_detected", "quality", "fp",
    }
    assert out.count() == len(DOCS)


def test_token_zipf(spark):
    import pytest

    from bigmatch_utilities_spark.operators.textanalysis import token_zipf

    df = spark.createDataFrame(
        [(1, "the cat the dog"), (2, "the cat"), (3, "bird")],
        "id long, text string",
    )
    rows = token_zipf(df, "text", top=3).collect()
    # counts: the=3, cat=2, dog=1, bird=1 (total 7); top-3 tie-break asc
    assert [(r["rank"], r["token"], r["cnt"]) for r in rows] == [
        (1, "the", 3),
        (2, "cat", 2),
        (3, "bird", 1),
    ]
    assert rows[0]["share"] == pytest.approx(3 / 7, abs=1e-6)
    assert rows[2]["cum_share"] == pytest.approx(6 / 7, abs=1e-6)


def test_token_zipf_parity(spark, tmp_path):
    import random as _random

    import duckdb as _duckdb

    from bigmatch_utilities_spark.operators.textanalysis import (
        token_zipf,
        token_zipf_sql,
    )

    rng = _random.Random(80805)
    vocab = ["alpha", "beta", "gamma", "the", "of", "x1", "don't"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pq = str(tmp_path / "z.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = [tuple(r) for r in token_zipf(df, "text", top=5).collect()]
    con = _duckdb.connect()
    con.execute(f"CREATE VIEW tbl AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    want = [
        tuple(r)
        for r in con.execute(token_zipf_sql("tbl", "text", top=5)).fetchall()
    ]
    assert got == want
