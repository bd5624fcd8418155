"""Comparator tests: the numpy Jaro-Winkler kernel against a scalar oracle,
published values, and DuckDB (the driver's correctness oracle)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from bigmatch_utilities_spark.functions.comparators import (
    jaro_winkler_np,
    similarity,
    similarity_sql,
)


def scalar_jaro_winkler(s1: str, s2: str) -> float:
    """Straightforward scalar reference implementation (standard algorithm,
    DuckDB conventions: empty → 0.0, boost only when jaro > 0.7)."""
    if not s1 or not s2:
        return 0.0
    la, lb = len(s1), len(s2)
    d = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    matched_a = []
    matched_b_idx = []
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - d), min(lb, i + d + 1)
        for j in range(lo, hi):
            if not used[j] and s2[j] == ch:
                used[j] = True
                matched_a.append(ch)
                matched_b_idx.append(j)
                break
    m = len(matched_a)
    if m == 0:
        return 0.0
    matched_b = [s2[j] for j in sorted(matched_b_idx)]
    # floored transpositions — DuckDB convention
    t = sum(a != b for a, b in zip(matched_a, matched_b)) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    if jaro > 0.7:
        return jaro + prefix * 0.1 * (1 - jaro)
    return jaro


PUBLISHED = [
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("THOMAS", "TOM", 0.8500000000000001),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("AB", "BA", 0.0),
    ("A", "A", 1.0),
    ("", "ABC", 0.0),
    ("", "", 0.0),
]


def test_published_values():
    a = pd.Series([x for x, _, _ in PUBLISHED])
    b = pd.Series([y for _, y, _ in PUBLISHED])
    got = jaro_winkler_np(a, b)
    want = np.array([w for _, _, w in PUBLISHED])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_matches_scalar_oracle_randomized():
    rng = random.Random(1234)
    alphabet = "ABCDEFab 01"
    cases = []
    for _ in range(3000):
        n1 = rng.randint(0, 12)
        n2 = rng.randint(0, 12)
        cases.append(
            (
                "".join(rng.choice(alphabet) for _ in range(n1)),
                "".join(rng.choice(alphabet) for _ in range(n2)),
            )
        )
    a = pd.Series([x for x, _ in cases])
    b = pd.Series([y for _, y in cases])
    got = jaro_winkler_np(a, b)
    want = np.array([scalar_jaro_winkler(x, y) for x, y in cases])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_matches_duckdb_exactly():
    """DuckDB is the driver's oracle — our kernel must agree bit-for-bit on
    realistic tokens."""
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(1, 15)))
        for _ in range(400)
    ]
    pairs = [(words[i], words[(i * 7 + 3) % len(words)]) for i in range(len(words))]
    got = jaro_winkler_np(
        pd.Series([a for a, _ in pairs]), pd.Series([b for _, b in pairs])
    )
    con = duckdb.connect()
    df = pd.DataFrame(pairs, columns=["a", "b"])
    con.register("t", df)
    want = con.sql("select jaro_winkler_similarity(a, b) from t").fetchnumpy()[
        "jaro_winkler_similarity(a, b)"
    ]
    np.testing.assert_allclose(got, np.asarray(want), atol=0)


def test_nulls_and_empty_batch():
    got = jaro_winkler_np(pd.Series([None, "x"]), pd.Series(["x", None]))
    np.testing.assert_allclose(got, [0.0, 0.0])
    got = jaro_winkler_np(pd.Series([], dtype=object), pd.Series([], dtype=object))
    assert len(got) == 0
    got = jaro_winkler_np(pd.Series(["", ""]), pd.Series(["", ""]))
    np.testing.assert_allclose(got, [0.0, 0.0])


@pytest.mark.parametrize(
    "comparator",
    ["c", "ci", "uo", "uoi", "p", "y", "q", "s", "e", "ei", "d", "n", "t"],
)
def test_spark_similarity_matches_duckdb_sql(spark, comparator):
    """Column-expression similarity and its SQL rendering agree on every
    comparator — this is the exact contract the driver's oracle check uses."""
    rows = [
        ("SMITH", "SMYTH"),
        ("SMITH", "SMITH"),
        ("smith", "SMITH"),
        ("1980", "1981"),
        ("1980", "1985"),
        ("42", "x"),
        ("", "SMITH"),
        ("MAIN ST W", "W MAIN ST"),
        ("MAIN  ST", "MAIN ST"),
        (None, "SMITH"),
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = [
        r[0]
        for r in df.select(similarity(comparator, "a", "b").alias("s")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["a", "b"]))
    want = [
        r[0]
        for r in con.sql(
            f"select {similarity_sql(comparator, 'a', 'b')} as s from t"
        ).fetchall()
    ]
    for g, w, row in zip(got, want, rows):
        if comparator in ("uo", "uoi", "s") and (row[0] is None or row[1] is None):
            # SQL null-propagates JW to NULL; Spark kernel returns 0.0 —
            # the scoring layer zero-weights blanks either way.
            continue
        assert g == pytest.approx(w if w is not None else 0.0, abs=1e-12), (
            comparator,
            row,
            g,
            w,
        )


def test_waterfall_breakdown_sums_to_pair_weight(spark):
    """field_weight_columns is the exact decomposition of pair_weight."""
    from pyspark.sql import functions as F

    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.scoring import (
        field_weight_columns,
        pair_weight,
    )

    fields = (
        MatchField(name="a", comparator="uo", m=0.9, u=0.1),
        MatchField(name="b", comparator="c", m=0.8, u=0.2),
    )
    rows = [
        ("martha", "marhta", "x", "x"),
        ("jones", "johnson", "x", "y"),
        ("", "anything", "x", "x"),  # blank -> 0 contribution for field a
        (None, None, None, "y"),
    ]
    df = spark.createDataFrame(rows, "rec_a string, mem_a string, rec_b string, mem_b string")
    parts = field_weight_columns(fields)
    out = df.select(
        sum(parts.values(), F.lit(0.0)).alias("sum_parts"),
        pair_weight(fields).alias("total"),
    ).collect()
    for r in out:
        assert r.sum_parts == pytest.approx(r.total, abs=1e-12)


def test_swapped_agreement_crossed_wins(spark):
    from bigmatch_utilities_spark.functions.comparators import (
        swapped_agreement,
        swapped_agreement_sql,
    )

    rows = [
        ("MARIA", "GARCIA", "MARIA", "GARCIA"),   # straight exact -> 1.0
        ("MARIA", "GARCIA", "GARCIA", "MARIA"),   # swapped exact  -> 1.0
        ("MARIA", "GARCIA", "GARCIA", "MARIE"),   # swapped, 1 edit in MARIA/MARIE
        ("MARIA", "GARCIA", "LOPEZ", "JUAN"),     # neither aligns
    ]
    df = spark.createDataFrame(rows, ["ra", "rb", "ma", "mb"])
    got = [
        r[0]
        for r in df.select(
            swapped_agreement("e", "ra", "rb", "ma", "mb").alias("s")
        ).collect()
    ]
    assert got[0] == 1.0 and got[1] == 1.0
    # crossed mean: (1.0 + (1 - 1/5)) / 2 = 0.9
    assert got[2] == pytest.approx(0.9, abs=1e-9)
    assert got[3] < 0.5

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["ra", "rb", "ma", "mb"]))
    want = [
        r[0]
        for r in con.sql(
            f"select {swapped_agreement_sql('e', 'ra', 'rb', 'ma', 'mb')} as s from t"
        ).fetchall()
    ]
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-12)


def _duckdb_parity(spark, comparator, rows):
    df = spark.createDataFrame(rows, ["a", "b"])
    got = [
        r[0]
        for r in df.select(similarity(comparator, "a", "b").alias("s")).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["a", "b"]))
    want = [
        r[0]
        for r in con.sql(
            f"select {similarity_sql(comparator, 'a', 'b')} as s from t"
        ).fetchall()
    ]
    return got, want


def test_date_comparator_bands_and_swap(spark):
    """`d`: banded day difference + day/month-transposition tolerance,
    bit-identical between the Column expression and the DuckDB SQL."""
    rows = [
        ("2000-01-01", "2000-01-01"),  # exact           -> 1.0
        ("1999-12-31", "2000-01-01"),  # 1 day           -> 0.9
        ("2000-02-03", "2000-03-02"),  # day/month swap  -> 0.8
        ("2000-01-01", "2000-01-06"),  # within a week   -> 0.7
        ("2000-01-01", "2000-01-25"),  # within a month  -> 0.5
        ("2000-01-01", "2000-11-01"),  # within a year   -> 0.25
        ("2000-01-01", "2005-01-01"),  # far apart       -> 0.0
        ("2000-02-29", "2000-02-29"),  # leap day parses -> 1.0
        ("not a date", "2000-01-01"),  # junk            -> 0.0
        (None, "2000-01-01"),          # null            -> 0.0
    ]
    got, want = _duckdb_parity(spark, "d", rows)
    expect = [1.0, 0.9, 0.8, 0.7, 0.5, 0.25, 0.0, 1.0, 0.0, 0.0]
    assert got == expect
    assert want == expect


def test_date_swap_requires_valid_transposition(spark):
    # 2000-01-13 vs 2000-13-01 is not a swap (month 13 invalid) and the
    # guarded make_date never throws under ANSI mode
    rows = [("2000-01-13", "2000-12-01"), ("2000-03-14", "2000-04-13")]
    got, want = _duckdb_parity(spark, "d", rows)
    assert got == want
    assert all(g not in (0.8,) for g in got)  # neither is a true swap


def test_numeric_relative_comparator(spark):
    rows = [
        ("10000", "10000"),   # exact       -> 1.0
        ("10000", "10050"),   # 0.5%        -> 0.9
        ("10000", "10400"),   # ~3.8%       -> 0.7
        ("10000", "10900"),   # ~8.3%       -> 0.4
        ("10000", "20000"),   # 50%         -> 0.0
        ("0", "0"),           # 0==0 before 0/0 -> 1.0
        ("-5", "-5.05"),      # signs: rel on abs -> 0.9
        ("x", "1"),           # junk        -> 0.0
        (None, "1"),          # null        -> 0.0
    ]
    got, want = _duckdb_parity(spark, "n", rows)
    expect = [1.0, 0.9, 0.7, 0.4, 0.0, 1.0, 0.9, 0.0, 0.0]
    assert got == expect
    assert want == expect


def test_token_set_jaccard_comparator(spark):
    rows = [
        ("ACME TRADING LTD", "LTD ACME TRADING"),  # rotation        -> 1.0
        ("ACME TRADING LTD", "ACME LTD"),          # 2/3 overlap     -> 2/3
        ("ACME ACME LTD", "acme ltd"),             # dups + case     -> 1.0
        ("MAIN  ST", "MAIN ST"),                   # double space    -> 1.0
        ("ALPHA", "BETA"),                         # disjoint        -> 0.0
        ("", ""),                                  # both blank      -> 1.0 (zero-weighted later)
        ("", "ACME"),                              # one blank       -> 0.0
        (None, "ACME"),                            # null            -> 0.0
        (None, None),                              # both null       -> 1.0 trivial
    ]
    got, want = _duckdb_parity(spark, "t", rows)
    expect = [1.0, 2.0 / 3.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0]
    for g, w, e in zip(got, want, expect):
        assert g == pytest.approx(e, abs=1e-12)
        assert w == pytest.approx(e, abs=1e-12)


def test_monge_elkan_comparator(spark):
    rows = [
        ("john smith", "john smith"),     # identical        -> 1.0
        ("john smith", "smith john"),     # rotation         -> 1.0
        ("jhon smith", "john smith jr"),  # typo + extra tok -> high, < 1.0
        ("alpha", "beta"),                # unrelated        -> low
        ("", ""),                         # both blank       -> 1.0 trivial
        ("", "acme"),                     # one blank        -> 0.0
        (None, "acme"),                   # null             -> 0.0
        (None, None),                     # both null        -> 1.0 trivial
    ]
    got, want = _duckdb_parity(spark, "me", rows)
    assert got == want  # bit-identical cross-engine (all-integer scheme)
    assert got[0] == 1.0
    assert got[1] == 1.0
    assert 0.6 < got[2] < 1.0  # 0.666667: see the worked example in-module
    assert got[3] < 0.5
    assert got[4] == 1.0 and got[5] == 0.0 and got[6] == 0.0 and got[7] == 1.0
    # the typo/extra-token case is exactly what token-set Jaccard misses
    jac = [
        r[0]
        for r in spark.createDataFrame([rows[2]], ["a", "b"])
        .select(similarity("t", "a", "b").alias("s"))
        .collect()
    ]
    assert got[2] > jac[0]


def test_monge_elkan_parity_randomized(spark):
    rng = random.Random(80803)
    vocab = ["john", "jhon", "smith", "smyth", "mary", "st", "main", "acme"]
    rows = []
    for _ in range(150):
        a = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        b = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
        rows.append((a, b))
    got, want = _duckdb_parity(spark, "me", rows)
    assert got == want


def test_monge_elkan_declarable_in_config(spark):
    """`me` is reachable from MatchConfig: validates and scores a pass."""
    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.scoring import (
        pair_weight,
        pair_weight_sql,
    )

    mf = MatchField(name="nm", comparator="me", m=0.9, u=0.1)  # must validate
    df = spark.createDataFrame(
        [("john smith", "smith john"), ("alpha beta", "gamma delta")],
        ["rec_nm", "mem_nm"],
    )
    got = [
        round(r[0], 6)
        for r in df.select(pair_weight((mf,)).alias("w")).collect()
    ]
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            [("john smith", "smith john"), ("alpha beta", "gamma delta")],
            columns=["rec_nm", "mem_nm"],
        ),
    )
    want = [
        round(r[0], 6)
        for r in con.sql(f"select {pair_weight_sql((mf,))} from t").fetchall()
    ]
    assert got == want
    assert got[0] > 0 > got[1]  # near-agreement scores up, disagreement down


def test_pair_weight_rescaled(spark):
    """Missing-field rescale: agrees with pair_weight when fully observed,
    extrapolates Σ/k·n when fields are blank, 0 when nothing observed."""
    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.scoring import (
        pair_weight,
        pair_weight_rescaled,
        pair_weight_rescaled_sql,
    )

    fields = (
        MatchField(name="a", comparator="c", m=0.9, u=0.1),
        MatchField(name="b", comparator="c", m=0.8, u=0.2),
        MatchField(name="c", comparator="c", m=0.7, u=0.3),
    )
    rows = [
        ("x", "x", "y", "y", "z", "z"),      # all observed, all agree
        ("x", "x", "", "y", "z", "z"),       # field b blank -> 2 obs
        ("", "x", "", "y", "", "z"),         # nothing observed -> 0.0
        ("x", "q", "", "y", "z", "z"),       # mixed agree/disagree, 2 obs
    ]
    cols = ["rec_a", "mem_a", "rec_b", "mem_b", "rec_c", "mem_c"]
    df = spark.createDataFrame(rows, cols)
    out = df.select(
        pair_weight(fields).alias("raw"),
        pair_weight_rescaled(fields).alias("res"),
    ).collect()
    # fully observed -> identical
    assert out[0]["res"] == pytest.approx(out[0]["raw"], abs=1e-12)
    # one blank of three -> raw * 3/2
    assert out[1]["res"] == pytest.approx(out[1]["raw"] * 1.5, abs=1e-12)
    assert out[3]["res"] == pytest.approx(out[3]["raw"] * 1.5, abs=1e-12)
    # nothing observed -> 0
    assert out[2]["res"] == 0.0
    # DuckDB parity
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=cols))
    want = [
        r[0]
        for r in con.sql(
            f"select {pair_weight_rescaled_sql(fields)} from t"
        ).fetchall()
    ]
    got = [r["res"] for r in out]
    assert got == pytest.approx(want, abs=0)
