"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: a blocked cross join
  with JVM-side `aggregate`/`zip_with` dot products;
* sign-LSH bucketed ANN — the scale path: bucket on the sign pattern of a
  fixed dimension subset (deterministic, SQL-twinned), search within
  buckets only.

At 10^12 rows brute force is only viable per-query (broadcast the query
set); the LSH variant turns the shuffle into a bucket-key equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + (x * x).cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin. list_cosine_similarity matches the same formula."""
    return (
        f"(CASE WHEN list_dot_product({a},{a}) > 0 AND list_dot_product({b},{b}) > 0 "
        f"THEN list_cosine_similarity({a}, {b}) ELSE 0.0 END)"
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set,
    score every vector, window-rank per query. Excludes self-matches."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = scored.withColumn("score", cosine(F.col(vec_col), F.col("_qvec")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id: sign bits of the first n_bits dimensions. Fixed
    hyperplanes (axis-aligned) keep it deterministic and SQL-computable;
    random-hyperplane LSH plugs in the same shape."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def sign_bucket_sql(vec: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"CAST(({terms}) AS INT)"


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.
    The join becomes an equi-join on bucket — shuffle ∝ bucket sizes."""
    v = vectors.withColumn("_bkt", sign_bucket(F.col(vec_col), n_bits))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        sign_bucket(F.col(vec_col), n_bits).alias("_bkt"),
    )
    scored = (
        v.join(F.broadcast(q), "_bkt")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("score", cosine(F.col(vec_col), F.col("_qvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rank")
    )
