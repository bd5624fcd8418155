"""Incremental matching with Structured Streaming.

The reference is strictly batch (one engine run per parmf; resumability =
rerun). The Spark rebuild adds an incremental mode: new records arrive as a
stream, are blocked + scored against a static reference table, and matched
pairs append to a sink — the streaming analog of one blocking pass.

Shape: ``readStream (file source) → blank-key filter → equi-join on the
composite block key against the static side → comparator/FS scoring →
writeStream (append)``. Stream-static joins need no watermark (state lives
only on the static side); the static reference should be broadcast-sized
per micro-batch or pre-bucketed by the block key. `Trigger.AvailableNow`
gives exactly-once catch-up semantics off the same checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bigmatch_utilities_spark.config import BlockingPassSpec
from bigmatch_utilities_spark.operators.blocking import apply_blank_flags
from bigmatch_utilities_spark.operators.scoring import is_exact, pair_weight


def stream_candidates(
    stream: DataFrame,
    static_mem: DataFrame,
    spec: BlockingPassSpec,
    id_col: str,
) -> DataFrame:
    """Blocked candidate pairs of (streaming rec) × (static mem)."""
    keys = [bf.name for bf in spec.block_fields]
    carry = [mf.name for mf in spec.match_fields]
    r = apply_blank_flags(stream, spec).select(
        F.col(id_col).alias("id_rec"),
        *[F.col(k).alias(f"bk_{k}") for k in keys],
        *[F.col(c).alias(f"rec_{c}") for c in carry],
    )
    m = apply_blank_flags(static_mem, spec).select(
        F.col(id_col).alias("id_mem"),
        *[F.col(k).alias(f"bk_{k}_m") for k in keys],
        *[F.col(c).alias(f"mem_{c}") for c in carry],
    )
    cond = [F.col(f"bk_{k}") == F.col(f"bk_{k}_m") for k in keys]
    return r.join(F.broadcast(m), on=cond, how="inner").drop(
        *[f"bk_{k}_m" for k in keys]
    )


def score_stream(
    stream: DataFrame, static_mem: DataFrame, spec: BlockingPassSpec, id_col: str
) -> DataFrame:
    cands = stream_candidates(stream, static_mem, spec, id_col)
    return (
        cands.withColumn("weight", pair_weight(spec.match_fields))
        .withColumn("is_exact", is_exact(spec.match_fields))
        .filter(F.col("weight") >= F.lit(float(min(spec.cutoff.lo, spec.print_cutoff.lo))))
    )


def run_incremental_match(
    spark: SparkSession,
    input_dir: str,
    input_schema: StructType | str,
    static_mem: DataFrame,
    spec: BlockingPassSpec,
    id_col: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source incremental match; AvailableNow drains the backlog then
    stops, exactly-once per checkpoint. Returns the finished query."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    scored = score_stream(stream, static_mem, spec, id_col)
    q = (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
