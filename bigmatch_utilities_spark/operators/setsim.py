"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

The approximate candidate generators in this repo (MinHash-LSH, SimHash,
winnowing, bloom-band) trade recall for scale: a pair above the
similarity threshold can be missed when its signatures land in different
buckets. This operator is the EXACT complement — Chaudhuri/Ganti/Kaushik
SSJoin and Bayardo's AllPairs prefix filter (the core of PPJoin): every
pair with Jaccard(tokens(x), tokens(y)) >= t is guaranteed to survive,
with no all-pairs comparison. The reference engine has no set-similarity
vocabulary at all — its closest notion is the `t` token-set comparator
scoring pairs some blocking pass already produced
(/root/reference/app/BigMatchParmFile.py method tokens); an exact
similarity JOIN (find the pairs in the first place, with a recall
guarantee) does not exist there.

The prefix-filter theorem: order all tokens globally (here: ascending
document frequency, ties by token text — rarest first, so prefixes are
the most selective tokens). If |x ∩ y| / |x ∪ y| >= t then x and y must
share at least one token among the first |x| - ceil(t*|x|) + 1 tokens of
x (and symmetrically y) under that global order. So: equi-join on prefix
tokens only, then verify the exact Jaccard on the survivors.

Scale shapes (the 100 TB question):

* token sets + document frequencies: two shuffles, linear in corpus
  tokens; per-record token ranking is a window partitioned by record id
  (each partition is ONE record's token set — no global sort).
* the candidate join touches only prefix postings — and because the
  global order is rarest-first, prefix tokens are by construction the
  LOW-frequency ones, so the equi-join buckets stay small (the
  skew-resistance argument in Bayardo §3; stopword-grade tokens never
  enter a prefix unless a record is almost all stopwords).
* exact integer length filter inside the join (t*|x| <= |y| and
  symmetrically) prunes length-incompatible pairs before the verify.
* verification joins full postings against candidate pairs only —
  bounded by candidates x shared tokens, never N².

Determinism / oracle-exactness: the threshold is a rational num/den and
every filter is integer arithmetic (`inter*den >= num*union`,
`num*nx <= den*ny`, prefix length via integer ceil) — both engines
compute bit-identical pair sets; the reported jaccard is one final
integer division rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.standardize import (
    _norm_tokens,
    _norm_tokens_sql,
)


def token_sets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) distinct normalized tokens — set semantics."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_norm_tokens(F.col(text_col))).alias("tok"),
    ).distinct()


def _ranked(toks: DataFrame) -> DataFrame:
    """tokens ranked per record by (global df asc, tok asc) + set size."""
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(dfreq, "tok")
    w = Window.partitionBy("id").orderBy("df", "tok")
    return ranked.select(
        "id",
        "tok",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("id")).alias("n_tok"),
    )


def jaccard_prefix_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    t_num: int = 6,
    t_den: int = 10,
    cache_handle: list | None = None,
) -> DataFrame:
    """All pairs with token-set Jaccard >= t_num/t_den — exact, via the
    prefix filter. Returns (id_l, id_r, n_tok_l, n_tok_r, inter, jaccard)
    with jaccard rounded to 6dp.

    `cache_handle` (dedup.lsh_cache convention): the ranked-postings plan
    feeds the prefix join AND the verification; pass a list to persist it
    once. At warehouse scale, materialize the postings as a table.
    """
    toks = token_sets(df, text_col, id_col)
    ranked = _ranked(toks)
    if cache_handle is not None:
        ranked = ranked.persist()
        cache_handle.append(ranked)

    # prefix length |x| - ceil(t*|x|) + 1; integer ceil(a/b) = (a+b-1) div b
    # (exact: positive-float truncation == floor far below 2^53)
    ceil_tn = (
        (F.lit(t_num) * F.col("n_tok") + F.lit(t_den - 1)) / F.lit(t_den)
    ).cast("long")
    pfx = ranked.filter(F.col("rnk") <= F.col("n_tok") - ceil_tn + 1)
    l = pfx.select(
        F.col("id").alias("id_l"), "tok", F.col("n_tok").alias("n_tok_l")
    )
    r = pfx.select(
        F.col("id").alias("id_r"), "tok", F.col("n_tok").alias("n_tok_r")
    )
    cand = (
        l.join(
            r,
            (l.tok == r.tok)
            & (F.col("id_l") < F.col("id_r"))
            # exact length filter: t <= n_r/n_l <= 1/t
            & (F.lit(t_num) * F.col("n_tok_l") <= F.lit(t_den) * F.col("n_tok_r"))
            & (F.lit(t_num) * F.col("n_tok_r") <= F.lit(t_den) * F.col("n_tok_l")),
        )
        .select("id_l", "id_r", "n_tok_l", "n_tok_r")
        .distinct()
    )

    # verify: exact intersection via the full postings, both sides
    pl = ranked.select(F.col("id").alias("id_l"), "tok")
    pr = ranked.select(F.col("id").alias("id_r"), "tok")
    inter = (
        cand.join(pl, "id_l")
        .join(pr, ["id_r", "tok"])
        .groupBy("id_l", "id_r", "n_tok_l", "n_tok_r")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter.filter(
        F.col("inter") * t_den
        >= F.lit(t_num) * (F.col("n_tok_l") + F.col("n_tok_r") - F.col("inter"))
    ).select(
        "id_l",
        "id_r",
        "n_tok_l",
        "n_tok_r",
        "inter",
        F.round(
            F.col("inter")
            / (F.col("n_tok_l") + F.col("n_tok_r") - F.col("inter")),
            6,
        ).alias("jaccard"),
    )


def jaccard_prefix_join_sql(
    table: str,
    text_expr: str,
    id_expr: str,
    *,
    t_num: int = 6,
    t_den: int = 10,
) -> str:
    """DuckDB oracle twin — identical integer arithmetic, identical pair
    set, 6dp-identical jaccard."""
    return f"""
WITH ss_toks AS (
  SELECT DISTINCT {id_expr} AS id,
         unnest({_norm_tokens_sql(text_expr)}) AS tok
  FROM {table}
),
ss_df AS (SELECT tok, count(*) AS df FROM ss_toks GROUP BY tok),
ss_ranked AS (
  SELECT t.id, t.tok,
         row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.tok) AS rnk,
         count(*) OVER (PARTITION BY t.id) AS n_tok
  FROM ss_toks t JOIN ss_df d USING (tok)
),
ss_pfx AS (
  SELECT * FROM ss_ranked
  WHERE rnk <= n_tok - (({t_num} * n_tok + {t_den - 1}) // {t_den}) + 1
),
ss_cand AS (
  SELECT DISTINCT a.id AS id_l, b.id AS id_r,
         a.n_tok AS n_tok_l, b.n_tok AS n_tok_r
  FROM ss_pfx a JOIN ss_pfx b
    ON a.tok = b.tok AND a.id < b.id
   AND {t_num} * a.n_tok <= {t_den} * b.n_tok
   AND {t_num} * b.n_tok <= {t_den} * a.n_tok
),
ss_inter AS (
  SELECT c.id_l, c.id_r, c.n_tok_l, c.n_tok_r, count(*) AS inter
  FROM ss_cand c
  JOIN ss_ranked pl ON pl.id = c.id_l
  JOIN ss_ranked pr ON pr.id = c.id_r AND pr.tok = pl.tok
  GROUP BY c.id_l, c.id_r, c.n_tok_l, c.n_tok_r
)
SELECT id_l, id_r, n_tok_l, n_tok_r, inter,
       round(inter / (n_tok_l + n_tok_r - inter), 6) AS jaccard
FROM ss_inter
WHERE inter * {t_den} >= {t_num} * (n_tok_l + n_tok_r - inter)
"""
