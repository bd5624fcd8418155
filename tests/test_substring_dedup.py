"""duplicated_span_profile: the winnowing guarantee on planted verbatim
spans, zero-report for unique text, short-doc zeros, and Spark<->DuckDB
parity on randomized inputs."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from bigmatch_utilities_spark.operators.substring_dedup import (
    duplicated_span_profile,
    duplicated_span_profile_sql,
)

K, W = 8, 4  # span guarantee: any verbatim match >= W+K-1 = 11 chars detected


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(4242)
    shared = _rand_text(rng, 60)  # verbatim span planted in docs 1 and 2
    rows = [
        (1, _rand_text(rng, 40) + shared + _rand_text(rng, 40)),
        (2, _rand_text(rng, 25) + shared + _rand_text(rng, 55)),
        (3, _rand_text(rng, 120)),  # unique
        (4, "tiny"),  # shorter than K: no windows at all
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_span_detected(planted):
    out = {
        r["doc_id"]: r
        for r in duplicated_span_profile(planted, k=K, w=W).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # winnowing guarantee: the 60-char shared span (>= 11) must be hit in
    # BOTH containing docs, and the reported coverage can't exceed the
    # document or undershoot a single window span
    for d in (1, 2):
        assert out[d]["n_dup_windows"] >= 1
        assert W + K - 1 <= out[d]["dup_chars"] <= out[d]["n_chars_norm"]
        assert out[d]["dup_frac"] > 0.0
    # coverage should be in the ballpark of the planted span, never 3x it
    assert out[1]["dup_chars"] <= 3 * 60
    # random 120-char text: no cross-doc fp collision expected at 48-bit
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dup_chars"] == 0
    assert out[3]["dup_frac"] == 0.0
    # doc shorter than K chars: zero windows, zero everything
    assert out[4]["n_windows"] == 0
    assert out[4]["dup_chars"] == 0


def test_identical_docs_fully_covered(spark):
    text = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in duplicated_span_profile(df, k=K, w=W).collect()}
    for d in (1, 2):
        # every window duplicated -> merged coverage = whole normalized doc
        assert out[d]["n_dup_windows"] == out[d]["n_windows"] > 0
        assert out[d]["dup_chars"] == out[d]["n_chars_norm"]
        assert out[d]["dup_frac"] == 1.0


def _parity(spark, rows, tmp_path, name):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / f"{name}.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(tuple(r) for r in duplicated_span_profile(df, k=K, w=W).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    sql = duplicated_span_profile_sql("documents", "text", "doc_id", k=K, w=W)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_parity_planted(spark, planted, tmp_path):
    _parity(spark, [(r["doc_id"], r["text"]) for r in planted.collect()], tmp_path, "a")


def test_parity_randomized(spark, tmp_path):
    rng = random.Random(80802)
    frags = [_rand_text(rng, rng.randint(10, 40)) for _ in range(8)]
    rows = []
    for i in range(40):
        parts = [rng.choice(frags) for _ in range(rng.randint(0, 5))]
        rng.shuffle(parts)
        rows.append((i, _rand_text(rng, rng.randint(0, 30)) + "".join(parts)))
    _parity(spark, rows, tmp_path, "b")


# ---------------------------------------------------------------------------
# excise_duplicated_spans
# ---------------------------------------------------------------------------

from bigmatch_utilities_spark.operators.substring_dedup import (
    excise_duplicated_spans,
    excise_duplicated_spans_sql,
)


def test_excise_removes_planted_span(spark, planted):
    out = {r["doc_id"]: r for r in excise_duplicated_spans(planted, k=K, w=W).collect()}
    prof = {r["doc_id"]: r for r in duplicated_span_profile(planted, k=K, w=W).collect()}
    for d in (1, 2):
        # the shared 60-char span is gone from both docs
        assert out[d]["n_cut_spans"] >= 1
        assert len(out[d]["clean_text"]) < prof[d]["n_chars_norm"]
        # cut accounting matches the profile's merged-span arithmetic
        assert out[d]["cut_chars"] == prof[d]["dup_chars"]
        assert len(out[d]["clean_text"]) == prof[d]["n_chars_norm"] - prof[d]["dup_chars"]
    # untouched docs pass through normalized and whole
    assert out[3]["n_cut_spans"] == 0
    assert len(out[3]["clean_text"]) == prof[3]["n_chars_norm"]
    assert out[4]["clean_text"] == "tiny"


def test_excise_identical_docs_cut_to_empty(spark):
    text = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in excise_duplicated_spans(df, k=K, w=W).collect()}
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["cut_chars"] > 0


def test_excise_parity(spark, planted, tmp_path):
    rows = [(r["doc_id"], r["text"]) for r in planted.collect()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "ex.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(tuple(r) for r in excise_duplicated_spans(df, k=K, w=W).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    sql = excise_duplicated_spans_sql("documents", "text", "doc_id", k=K, w=W)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


def test_excise_parity_randomized(spark, tmp_path):
    rng = random.Random(80806)
    frags = [_rand_text(rng, rng.randint(12, 40)) for _ in range(6)]
    rows = []
    for i in range(30):
        parts = [rng.choice(frags) for _ in range(rng.randint(0, 4))]
        rows.append((i, _rand_text(rng, rng.randint(0, 25)) + "".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "exr.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = sorted(tuple(r) for r in excise_duplicated_spans(df, k=K, w=W).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    sql = excise_duplicated_spans_sql("documents", "text", "doc_id", k=K, w=W)
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
