"""Stateful streaming deduplication via ``applyInPandasWithState``.

A training-data ingest stream must drop documents whose content has
already been admitted — across micro-batches, restarts, and out-of-order
arrival. Spark's built-in ``dropDuplicates`` on a stream keeps unbounded
state keyed by the dedup column itself; this operator instead keys state
by a bounded **hash prefix** group and keeps one compact set of seen
content hashes per group, which:

* bounds the state-store key space (``2^prefix_bits`` groups, tunable to
  the cluster's state backend);
* admits the FIRST arrival of each content hash and drops every later
  one (first-seen-wins, the streaming analog of the batch
  ``dedup_exact`` min-id rule);
* is exactly-once off the checkpoint dir: replayed batches re-derive the
  same admit/drop decisions because state commits with the sink epoch.

Shape: ``readStream → sha2(content) → groupBy(hash prefix) →
applyInPandasWithState(admit-if-unseen) → writeStream``. At 10^12-file
scale the prefix groups shard the seen-set horizontally across
executors; each group's state is a flat binary-packed hash set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

#: hex chars of sha2-256 used as the state-sharding group key
PREFIX_CHARS = 2


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Admit rows whose content_sha was never seen by this group before.

    State is one tuple ``(seen,)`` where ``seen`` is the concatenation of
    64-char sha hex strings — flat and cheap to (de)serialize through the
    state store. Within a batch, the first occurrence wins and later rows
    with the same sha (same or later pandas chunk) are dropped."""
    if state.exists:
        (seen_blob,) = state.get
        seen = set(
            seen_blob[i : i + 64] for i in range(0, len(seen_blob), 64)
        )
    else:
        seen = set()
    admitted = 0
    for pdf in pdfs:
        mask = []
        for sha in pdf["content_sha"]:
            if sha in seen:
                mask.append(False)
            else:
                seen.add(sha)
                mask.append(True)
        out = pdf[mask].drop(columns=["_shard"], errors="ignore")
        admitted += len(out)
        if len(out):
            yield out
    state.update(("".join(sorted(seen)),))


def dedup_stream(
    stream: DataFrame,
    content_col: str = "content",
    *,
    output_schema: StructType | str,
) -> DataFrame:
    """content-sha first-seen-wins dedup over a streaming DataFrame.

    `output_schema` must be the input schema plus a ``content_sha string``
    column (applyInPandasWithState requires an explicit schema)."""
    hashed = stream.withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    ).withColumn("_shard", F.substring("content_sha", 1, PREFIX_CHARS))
    grouped = hashed.groupBy("_shard")
    return grouped.applyInPandasWithState(
        _dedup_fn,
        outputStructType=output_schema,
        stateStructType="seen string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_dedup(
    spark: SparkSession,
    input_dir: str,
    input_schema: StructType | str,
    content_col: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """File-source streaming dedup; AvailableNow drains the backlog then
    stops — exactly-once per checkpoint dir (the two-batch resume test
    proves replay safety)."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    if isinstance(input_schema, str):
        out_schema = input_schema + ", content_sha string"
    else:
        out_schema = input_schema.add("content_sha", "string")
    # applyInPandasWithState drops non-key grouping columns from the input
    # frame; the UDF receives every column of `hashed`, so the output
    # schema is input + content_sha.
    deduped = dedup_stream(stream, content_col, output_schema=out_schema)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
