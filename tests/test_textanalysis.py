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
