"""Isotonic calibration: the minimax fit equals hand-computed PAV,
monotonicity, edge clamping, and cross-engine parity."""

from __future__ import annotations

import duckdb
import pytest

from bigmatch_utilities_spark.operators.evaluate import (
    isotonic_calibration,
    isotonic_calibration_sql,
)


def _pairs_with_rates(spark, rates_per_bin, n_per_bin=10):
    """bin b gets n_per_bin pairs at weight b+0.5; the first
    round(rate*n) of them are 'true'."""
    pairs, truth = [], []
    pid = 0
    for b, rate in enumerate(rates_per_bin):
        n_true = round(rate * n_per_bin)
        for i in range(n_per_bin):
            l, r = 2 * pid, 2 * pid + 1
            pairs.append((l, r, b + 0.5))
            if i < n_true:
                truth.append((l, r))
            pid += 1
    p = spark.createDataFrame(pairs, "id_l long, id_r long, weight double")
    t = spark.createDataFrame(truth, "id_l long, id_r long")
    return p, t


def test_pav_pools_violators(spark):
    # raw rates [0.1, 0.5, 0.3, 0.9]: bins 1,2 violate monotonicity ->
    # PAV pools them to (5+3)/20 = 0.4
    p, t = _pairs_with_rates(spark, [0.1, 0.5, 0.3, 0.9])
    out = {
        r.bin: (r.raw_rate, r.iso_rate)
        for r in isotonic_calibration(p, t, lo=0.0, hi=4.0, n_bins=4).collect()
    }
    assert out[0] == (0.1, 0.1)
    assert out[1] == (0.5, 0.4)
    assert out[2] == (0.3, 0.4)
    assert out[3] == (0.9, 0.9)


def test_already_monotone_unchanged(spark):
    p, t = _pairs_with_rates(spark, [0.0, 0.2, 0.7, 1.0])
    out = isotonic_calibration(p, t, lo=0.0, hi=4.0, n_bins=4).collect()
    for r in out:
        assert r.iso_rate == r.raw_rate


def test_iso_is_monotone_even_on_decreasing_input(spark):
    p, t = _pairs_with_rates(spark, [0.9, 0.6, 0.4, 0.1])
    rows = sorted(
        isotonic_calibration(p, t, lo=0.0, hi=4.0, n_bins=4).collect(),
        key=lambda r: r.bin,
    )
    vals = [r.iso_rate for r in rows]
    assert vals == sorted(vals)
    assert vals[0] == vals[-1] == pytest.approx(0.5)  # full pool


def test_out_of_range_weights_clamp(spark):
    p, t = _pairs_with_rates(spark, [0.5, 0.5])
    extra = p.sparkSession.createDataFrame(
        [(9000, 9001, -5.0), (9002, 9003, 99.0)],
        "id_l long, id_r long, weight double",
    )
    out = {
        r.bin: r.n
        for r in isotonic_calibration(
            p.unionByName(extra), t, lo=0.0, hi=2.0, n_bins=2
        ).collect()
    }
    assert out[0] == 11 and out[1] == 11


def test_validates(spark):
    p, t = _pairs_with_rates(spark, [0.5])
    with pytest.raises(ValueError):
        isotonic_calibration(p, t, lo=1.0, hi=1.0, n_bins=4)
    with pytest.raises(ValueError):
        isotonic_calibration_sql("x", "y", lo=0.0, hi=1.0, n_bins=0)


def test_oracle_parity(spark, tmp_path):
    p, t = _pairs_with_rates(spark, [0.3, 0.8, 0.2, 0.6, 0.9], n_per_bin=7)
    p.write.mode("overwrite").parquet(str(tmp_path / "p.parquet"))
    t.write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    got = sorted(
        tuple(r)
        for r in isotonic_calibration(p, t, lo=0.0, hi=5.0, n_bins=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pv AS SELECT * FROM read_parquet('{tmp_path}/p.parquet/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW tv AS SELECT * FROM read_parquet('{tmp_path}/t.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            isotonic_calibration_sql(
                "SELECT * FROM pv", "SELECT * FROM tv", lo=0.0, hi=5.0, n_bins=5
            )
        ).fetchall()
    )
    assert got == want
