"""Population-stability (PSI) drift report between two corpus snapshots
— exact cross-engine oracle.

A linkage/curation pipeline that runs monthly needs to know when its
inputs moved: a blocking key whose value distribution shifted degrades
pass recall silently; a quality filter tuned on last year's corpus
misfires on this year's. The standard monitor is the Population
Stability Index over a column's value histogram:

    PSI = sum_v (p_v - q_v) * ln(p_v / q_v)

(p = baseline share, q = current share; > 0.25 conventionally "major
shift"). Zero-count values make the log blow up, so both sides use
add-one smoothing over the UNION vocabulary (V values): n' = n + 1,
N' = N + V.

Determinism discipline (the classify.py convention): the log factor is
computed as L(n'_a) - L(N'_a) - L(n'_b) + L(N'_b) in integer micro-nats
(L(n) = round(ln(n)·1e6), n exact integers), the share difference is one
float expression over exact integers, and each value's contribution is
rounded to an INTEGER micro-nat immediately — the total is then an
order-independent integer sum, identical on both engines.

Scale: one map-side-combined groupBy per snapshot over the column's
distinct values, a full outer join on value (distinct-sized frames), and
a 1-row total. Designed for categorical / bucketed columns — bucket
continuous columns first (e.g. round(weight, 1)), exactly as classic
PSI prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classify import _L, _L_sql


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
) -> DataFrame:
    """Per-value drift rows: (value, n_base, n_cur, contrib_micro) with
    contrib_micro the value's integer micro-nat PSI contribution.
    NULLs count as the value '__null__'; sum(contrib_micro)/1e6 is the
    PSI. See psi_total for the 1-row summary."""
    def counts(df, name):
        return (
            df.select(
                F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias(
                    "value"
                )
            )
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias(name))
        )

    a = counts(baseline, "n_base")
    b = counts(current, "n_cur")
    j = a.join(b, on="value", how="full_outer").select(
        "value",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    tot = j.agg(
        F.sum("n_base").alias("_na"),
        F.sum("n_cur").alias("_nb"),
        F.count(F.lit(1)).alias("_v"),
    )
    sm = j.crossJoin(F.broadcast(tot)).select(
        "value",
        "n_base",
        "n_cur",
        (F.col("n_base") + 1).alias("_a1"),
        (F.col("n_cur") + 1).alias("_b1"),
        (F.col("_na") + F.col("_v")).alias("_Na"),
        (F.col("_nb") + F.col("_v")).alias("_Nb"),
    )
    log_term = (
        _L(F.col("_a1")) - _L(F.col("_Na")) - _L(F.col("_b1")) + _L(F.col("_Nb"))
    )
    frac_diff = (
        F.col("_a1").cast("double") / F.col("_Na")
        - F.col("_b1").cast("double") / F.col("_Nb")
    )
    return sm.select(
        "value",
        "n_base",
        "n_cur",
        F.round(frac_diff * log_term.cast("double"), 0)
        .cast("long")
        .alias("contrib_micro"),
    )


def psi_total(
    baseline: DataFrame, current: DataFrame, col: str
) -> DataFrame:
    """(column, n_values, psi) — 1-row summary; psi = Σcontrib / 1e6."""
    rep = psi_report(baseline, current, col)
    return rep.agg(
        F.lit(col).alias("column"),
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.sum("contrib_micro") / 1e6, 6).alias("psi"),
    )


def psi_report_sql(
    baseline_sql: str, current_sql: str, col_expr: str
) -> str:
    """DuckDB twin of psi_report — identical smoothing, integer log
    factor, and per-value rounding."""
    log_term = (
        f"({_L_sql('_a1')} - {_L_sql('_Na')} - {_L_sql('_b1')} + {_L_sql('_Nb')})"
    )
    return f"""
WITH ps_a AS (
  SELECT COALESCE(CAST({col_expr} AS VARCHAR), '__null__') AS value,
         count(*) AS n_base
  FROM ({baseline_sql}) GROUP BY 1
),
ps_b AS (
  SELECT COALESCE(CAST({col_expr} AS VARCHAR), '__null__') AS value,
         count(*) AS n_cur
  FROM ({current_sql}) GROUP BY 1
),
ps_j AS (
  SELECT COALESCE(a.value, b.value) AS value,
         COALESCE(a.n_base, 0) AS n_base,
         COALESCE(b.n_cur, 0) AS n_cur
  FROM ps_a a FULL OUTER JOIN ps_b b USING (value)
),
ps_tot AS (
  SELECT SUM(n_base) AS _na, SUM(n_cur) AS _nb, count(*) AS _v FROM ps_j
),
ps_sm AS (
  SELECT value, n_base, n_cur,
         n_base + 1 AS _a1, n_cur + 1 AS _b1,
         _na + _v AS _Na, _nb + _v AS _Nb
  FROM ps_j CROSS JOIN ps_tot
)
SELECT value,
       CAST(n_base AS BIGINT) AS n_base,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(round((CAST(_a1 AS DOUBLE) / _Na - CAST(_b1 AS DOUBLE) / _Nb)
                  * CAST({log_term} AS DOUBLE), 0) AS BIGINT) AS contrib_micro
FROM ps_sm
"""


__all__ = ["psi_report", "psi_total", "psi_report_sql"]
