"""EM m/u estimation: statistical recovery on known-parameter data,
engine parity (Spark driver-side EM == unrolled-CTE DuckDB SQL), and the
one-shuffle histogram contract."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.config import MatchField
from bigmatch_utilities_spark.operators.em import (
    em_fit,
    estimate_mu,
    estimate_mu_sql,
    pattern_histogram,
)

FIELDS = (
    MatchField(name="a", comparator="c", m=0.9, u=0.1),
    MatchField(name="b", comparator="c", m=0.9, u=0.1),
    MatchField(name="c", comparator="c", m=0.9, u=0.1),
)

# ground truth for the synthetic population
TRUE_LAM, TRUE_M, TRUE_U = 0.2, [0.95, 0.85, 0.90], [0.05, 0.15, 0.10]


def _synthetic_hist(n_pairs: int = 200_000, seed: int = 7):
    """Exact-expectation histogram for the 3-field model (no sampling noise:
    EM's fixed point is then the true parameters up to label swap)."""
    hist = []
    for g0 in (0, 1):
        for g1 in (0, 1):
            for g2 in (0, 1):
                g = (g0, g1, g2)
                pm = TRUE_LAM
                pu = 1.0 - TRUE_LAM
                for k, gk in enumerate(g):
                    pm *= TRUE_M[k] if gk else 1.0 - TRUE_M[k]
                    pu *= TRUE_U[k] if gk else 1.0 - TRUE_U[k]
                hist.append((g, n_pairs * (pm + pu)))
    return hist


def test_em_fit_recovers_known_parameters():
    hist = _synthetic_hist()
    lam, m, u = em_fit(hist, 3, n_iter=60)
    assert lam == pytest.approx(TRUE_LAM, abs=0.01)
    for k in range(3):
        assert m[k] == pytest.approx(TRUE_M[k], abs=0.02)
        assert u[k] == pytest.approx(TRUE_U[k], abs=0.02)


def test_em_fit_monotone_likelihood():
    """EM's defining property: observed-data log-likelihood never
    decreases across iterations."""
    import math

    hist = _synthetic_hist()

    def loglik(lam, m, u):
        ll = 0.0
        for g, n in hist:
            pm, pu = lam, 1.0 - lam
            for k, gk in enumerate(g):
                pm *= m[k] if gk else 1.0 - m[k]
                pu *= u[k] if gk else 1.0 - u[k]
            ll += n * math.log(pm + pu)
        return ll

    prev = None
    for it in range(1, 12):
        lam, m, u = em_fit(hist, 3, n_iter=it)
        ll = loglik(lam, m, u)
        if prev is not None:
            assert ll >= prev - 1e-9
        prev = ll


def _pairs_df(spark, n: int = 4000, seed: int = 13):
    """Unlabeled pairs sampled from the two-class model; string fields so
    the `c` comparator + blank handling run the real code path."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        is_match = rng.random() < TRUE_LAM
        row = {"id_l": 2 * i, "id_r": 2 * i + 1}
        for k, f in enumerate(FIELDS):
            p = TRUE_M[k] if is_match else TRUE_U[k]
            left = f"v{i}_{k}"
            right = left if rng.random() < p else f"w{i}_{k}"
            row[f"rec_{f.name}"] = left
            row[f"mem_{f.name}"] = right
        rows.append(row)
    return spark.createDataFrame(rows)


def test_estimate_mu_matches_duckdb_oracle(spark, tmp_path):
    pairs = _pairs_df(spark)
    pq = str(tmp_path / "pairs.parquet")
    pairs.write.mode("overwrite").parquet(pq)

    got = {
        r["field"]: (r["m"], r["u"], r["lam"], r["agr_w"], r["dis_w"])
        for r in estimate_mu(pairs, FIELDS).collect()
    }

    con = duckdb.connect()
    sql = estimate_mu_sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')", FIELDS)
    want = {
        f: (m, u, lam, aw, dw)
        for f, m, u, lam, aw, dw in con.execute(sql).fetchall()
    }
    assert got == want
    # sampled at n=4000 the estimates should still be in the right basin
    assert got["a"][0] > 0.5 > got["a"][1]


def test_histogram_is_single_aggregation(spark):
    """The distributed pass is ONE partial-aggregated groupBy — the plan
    must show exactly one Exchange and the collected histogram <= 2^K rows."""
    pairs = _pairs_df(spark, n=500)
    hist = pattern_histogram(pairs, FIELDS)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert hist.count() <= 2 ** len(FIELDS)


def test_estimate_mu_blank_is_disagreement(spark):
    pairs = _pairs_df(spark, n=300).withColumn(
        "rec_a", F.when(F.col("id_l") % 3 == 0, F.lit("")).otherwise(F.col("rec_a"))
    )
    out = estimate_mu(pairs, FIELDS)
    assert out.count() == len(FIELDS)  # runs clean with blanks present


def test_estimate_mu_empty_pairs_raises(spark):
    with pytest.raises(ValueError):
        estimate_mu(_pairs_df(spark, n=10).limit(0), FIELDS)


def test_precomputed_gammas_fold_em_onto_one_scoring_pass(spark):
    """VERDICT r4 item 4: with gamma_fields, the linkage attaches g_<field>
    indicators in the scoring stage; estimate_mu over result.pairs must
    (a) equal the old enrichment-join path value-for-value, and (b) plan as
    a pure aggregation — no Join, no Python/Arrow eval."""
    from bigmatch_utilities_spark.repo_linkage import (
        _FUZZY_FIELDS,
        ID_COL,
        prepare,
        run_repo_linkage,
    )
    from bigmatch_utilities_spark.synthdata import repo_files_df

    df = repo_files_df(spark, seed=7, n_clusters=60)
    result = run_repo_linkage(
        df, use_minhash_pass=True, gamma_fields=_FUZZY_FIELDS
    )
    gcols = [f"g_{mf.name}" for mf in _FUZZY_FIELDS]
    assert all(c in result.pairs.columns for c in gcols)

    got = {
        r["field"]: (r["m"], r["u"], r["lam"])
        for r in estimate_mu(result.pairs, _FUZZY_FIELDS).collect()
    }

    # the retired path: join field values back and recompute gammas
    prep = prepare(df)
    fnames = sorted({mf.name for mf in _FUZZY_FIELDS})
    rec = prep.select(
        prep[ID_COL].alias("id_rec"), *[prep[c].alias(f"rec_{c}") for c in fnames]
    )
    mem = prep.select(
        prep[ID_COL].alias("id_mem"), *[prep[c].alias(f"mem_{c}") for c in fnames]
    )
    enriched = (
        result.pairs.select("id_rec", "id_mem").join(rec, "id_rec").join(mem, "id_mem")
    )
    want = {
        r["field"]: (r["m"], r["u"], r["lam"])
        for r in estimate_mu(enriched, _FUZZY_FIELDS).collect()
    }
    assert got == want

    # plan shape on a materialized pairs table (what the job reads back):
    # one aggregation, zero joins, zero Python evaluation
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        result.pairs.write.mode("overwrite").parquet(f"{td}/pairs")
        hist = pattern_histogram(
            spark.read.parquet(f"{td}/pairs"), _FUZZY_FIELDS
        )
        plan = hist._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
        for marker in ("ArrowEval", "BatchEvalPython", "PythonUDF"):
            assert marker not in plan
        # and the written pairs carry the indicators the fast path reads
        assert {
            r["field"]: (r["m"], r["u"], r["lam"])
            for r in estimate_mu(
                spark.read.parquet(f"{td}/pairs"), _FUZZY_FIELDS
            ).collect()
        } == got


def test_estimate_posterior_matches_duckdb_oracle(spark, tmp_path):
    """Per-pair posterior: Spark (driver-side EM + CASE multiply chain)
    equals the unrolled-CTE DuckDB twin exactly at 6dp."""
    from bigmatch_utilities_spark.operators.em import (
        estimate_posterior,
        estimate_posterior_sql,
    )

    pairs = _pairs_df(spark, n=1500)
    pq = str(tmp_path / "ppairs.parquet")
    pairs.write.mode("overwrite").parquet(pq)

    got = {
        (r["id_l"], r["id_r"]): r["posterior"]
        for r in estimate_posterior(pairs, FIELDS).collect()
    }
    con = duckdb.connect()
    sql = estimate_posterior_sql(
        f"SELECT * FROM read_parquet('{pq}/*.parquet')", FIELDS
    )
    want = {(l, r): p for l, r, p in con.execute(sql).fetchall()}
    assert got == want


def test_posterior_monotone_in_agreement(spark):
    """More agreeing fields => strictly higher posterior; all-agree is
    near 1 and all-disagree near 0 on well-separated parameters."""
    from bigmatch_utilities_spark.operators.em import match_posterior

    rows = []
    for i, g in enumerate([(0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 1)]):
        row = {"id_l": i, "id_r": 100 + i}
        for k, f in enumerate(FIELDS):
            row[f"rec_{f.name}"] = f"x{k}"
            row[f"mem_{f.name}"] = f"x{k}" if g[k] else f"y{k}"
        rows.append(row)
    df = spark.createDataFrame(rows)
    got = {
        r["id_l"]: r["posterior"]
        for r in match_posterior(
            df, FIELDS, lam=0.2, m=TRUE_M, u=TRUE_U
        ).collect()
    }
    assert got[0] < got[1] < got[2] < got[3]
    assert got[0] < 0.05 and got[3] > 0.99


def test_posterior_plan_is_map_only(spark):
    """The posterior attach is pure codegen: no join, no shuffle, no
    Python evaluation in the optimized plan."""
    from bigmatch_utilities_spark.operators.em import match_posterior

    df = _pairs_df(spark, n=50)
    plan = (
        match_posterior(df, FIELDS, 0.2, TRUE_M, TRUE_U)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" not in plan
    for marker in ("ArrowEval", "BatchEvalPython", "PythonUDF"):
        assert marker not in plan


# ---------------------------------------------------------------------------
# direct u estimation from deterministic random pairing
# ---------------------------------------------------------------------------


def _people_df(spark, n=400, seed=11):
    rng = random.Random(seed)
    cities = ["ny", "la", "sf", "dc", "chi"]
    rows = [
        {
            "pid": i,
            "city": rng.choice(cities),
            "yob": str(rng.randint(1950, 1999)),
            "zip": "" if i % 37 == 0 else f"{rng.randint(10, 99)}",
        }
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


U_FIELDS = (
    MatchField(name="city", comparator="c", m=0.9, u=0.2),
    MatchField(name="yob", comparator="c", m=0.9, u=0.02),
    MatchField(name="zip", comparator="c", m=0.9, u=0.01),
)


def test_estimate_u_random_matches_duckdb_oracle(spark, tmp_path):
    from bigmatch_utilities_spark.operators.em import (
        estimate_u_random,
        estimate_u_random_sql,
    )

    df = _people_df(spark)
    path = str(tmp_path / "people.parquet")
    df.write.mode("overwrite").parquet(path)

    got = sorted(
        (r.field, r.n_pairs, r.n_obs, r.n_agree, float(r.u))
        for r in estimate_u_random(df, "pid", U_FIELDS).collect()
    )
    sql = estimate_u_random_sql(
        f"SELECT * FROM read_parquet('{path}/*.parquet')", "pid", U_FIELDS
    )
    exp = sorted(
        (f, int(p), int(o), int(a), float(u))
        for f, p, o, a, u in duckdb.sql(sql).fetchall()
    )
    assert got == exp
    # disjoint consecutive pairing: exactly floor(N/2) pairs everywhere
    assert all(p == 200 for _, p, *_ in got)


def test_estimate_u_random_rate_recovers_collision_probability(spark):
    """On uniform categorical fields the u estimate must approach the
    analytic collision probability (1/#values), the quantity the FS
    u-probability measures."""
    from bigmatch_utilities_spark.operators.em import estimate_u_random

    df = _people_df(spark, n=2000)
    u = {r.field: r.u for r in estimate_u_random(df, "pid", U_FIELDS).collect()}
    assert u["city"] == pytest.approx(1 / 5, abs=0.05)
    assert u["yob"] == pytest.approx(1 / 50, abs=0.015)


def test_estimate_u_random_blank_excluded_from_denominator(spark):
    """Blank-on-either-side pairs leave the field's n_obs, never count as
    agreement, and never crash the division (all-blank field -> u = 0)."""
    from bigmatch_utilities_spark.operators.em import estimate_u_random

    df = _people_df(spark, n=100).withColumn("zip", F.lit(""))
    rows = {r.field: r for r in estimate_u_random(df, "pid", U_FIELDS).collect()}
    z = rows["zip"]
    assert z.n_obs == 0 and z.n_agree == 0 and z.u == 0.0
    assert rows["city"].n_obs == rows["city"].n_pairs


def test_estimate_u_random_max_pairs_is_a_uniform_prefix(spark):
    """max_pairs caps the join to the first 2k ranks of the md5 order: the
    capped pair set is a SUBSET of the uncapped one and exactly k pairs."""
    from bigmatch_utilities_spark.operators.em import estimate_u_random

    df = _people_df(spark, n=300)
    capped = estimate_u_random(df, "pid", U_FIELDS, max_pairs=40).collect()
    assert all(r.n_pairs == 40 for r in capped)


def test_estimate_u_random_partitioning_invariant(spark):
    """Deterministic contract: identical output at 1 and 16 partitions."""
    from bigmatch_utilities_spark.operators.em import estimate_u_random

    df = _people_df(spark, n=500)
    a = sorted(
        (r.field, r.n_agree, float(r.u))
        for r in estimate_u_random(df.coalesce(1), "pid", U_FIELDS).collect()
    )
    b = sorted(
        (r.field, r.n_agree, float(r.u))
        for r in estimate_u_random(
            df.repartition(16), "pid", U_FIELDS
        ).collect()
    )
    assert a == b


def test_pattern_dependence_independent_fields_lift_near_one(spark):
    """Fields generated independently → every pattern's lift ≈ 1; a
    planted co-firing pair of fields → multi-agree lift > 1."""
    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.em import pattern_dependence

    mfs = (
        MatchField(name="a", comparator="c", m=0.9, u=0.1),
        MatchField(name="b", comparator="c", m=0.9, u=0.1),
    )
    # independent: a agrees on i%2, b agrees on i%3 — product structure
    rows = [
        (
            "x", "x" if i % 2 == 0 else "y",
            "p", "p" if i % 3 == 0 else "q",
        )
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "rec_a string, mem_a string, rec_b string, mem_b string")
    got = {
        (r.g_a, r.g_b): r.lift
        for r in pattern_dependence(df, mfs).collect()
    }
    for v in got.values():
        assert abs(v - 1.0) < 0.02, got
    # co-firing: b agrees exactly when a does
    rows2 = [
        (
            "x", "x" if i % 2 == 0 else "y",
            "p", "p" if i % 2 == 0 else "q",
        )
        for i in range(600)
    ]
    df2 = spark.createDataFrame(rows2, "rec_a string, mem_a string, rec_b string, mem_b string")
    got2 = {
        (r.g_a, r.g_b): r.lift
        for r in pattern_dependence(df2, mfs).collect()
    }
    assert got2[(1, 1)] > 1.9 and got2[(0, 0)] > 1.9
    assert (1, 0) not in got2 and (0, 1) not in got2


def test_pattern_dependence_expected_scaled_exact(spark):
    """expected_scaled equals the hand-computed integer product and n
    sums back to N."""
    from bigmatch_utilities_spark.config import MatchField
    from bigmatch_utilities_spark.operators.em import pattern_dependence

    mfs = (MatchField(name="a", comparator="c", m=0.9, u=0.1),)
    rows = [("x", "x")] * 7 + [("x", "y")] * 3
    df = spark.createDataFrame(rows, "rec_a string, mem_a string")
    out = {r.g_a: (r.n, r.expected_scaled, r.lift) for r in pattern_dependence(df, mfs).collect()}
    # K=1: expected_scaled = a or N-a; N^(K-1) = 1 → lift = n/expected
    assert out[1] == (7, 7, 1.0)
    assert out[0] == (3, 3, 1.0)
