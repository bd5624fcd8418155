"""Stateful streaming deduplication via ``applyInPandasWithState``.

A training-data ingest stream must drop documents whose content has
already been admitted — across micro-batches, restarts, and out-of-order
arrival. State here is keyed by the **full content hash**: one state row
per distinct ``sha2(content)``, holding a single boolean. This is the
layout that survives the 10^12-file design point:

* state per key is O(1) and is written **once**, when the hash is first
  admitted — a micro-batch's state-store writes are proportional to the
  number of NEW hashes in that batch, never to the total corpus seen
  (the driver-visible invariant: ``numRowsUpdated`` == new hashes);
* the state backend shards the key space across executors (RocksDB /
  HDFS-backed store), so total state scales horizontally exactly like
  the data — no group ever accumulates a blob that must be re-read and
  re-serialized per batch;
* groups whose hash was already admitted do a single state-existence
  check and emit nothing; first arrival within a batch wins
  (first-seen-wins, the streaming analog of the batch ``dedup_exact``
  min-id rule);
* exactly-once off the checkpoint dir: replayed batches re-derive the
  same admit/drop decisions because state commits with the sink epoch.

Shape: ``readStream → sha2(content) → groupBy(content_sha) →
applyInPandasWithState(admit-if-no-state) → writeStream``. (An earlier
design grouped by a bounded hash *prefix* and kept a concatenated
seen-set per group — bounded key space, but each group's value grew
with distinct content and was rewritten wholesale every batch:
O(all-seen) work per batch. Keying by the hash itself moves the
sharding problem to the state backend, which is built for it.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One group == one content_sha. Admit the first row ever seen for
    this hash; drop everything else. State is a single ``(True,)`` tuple
    written exactly once per distinct hash — later batches containing
    the same hash read it and write nothing."""
    if state.exists:
        for _ in pdfs:  # drain: every row is a known duplicate
            pass
        return
    admitted = False
    for pdf in pdfs:
        if not admitted and len(pdf):
            state.update((True,))
            admitted = True
            yield pdf.head(1)
        # rest of this chunk (and all later chunks) are in-batch dupes


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
    )
    grouped = hashed.groupBy("content_sha")
    return grouped.applyInPandasWithState(
        _dedup_fn,
        outputStructType=output_schema,
        stateStructType="seen boolean",
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
    proves replay safety). Returns the finished query; its
    ``recentProgress`` state-operator rows expose the O(new-hashes)
    per-batch write invariant (asserted in tests)."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    if isinstance(input_schema, str):
        out_schema = input_schema + ", content_sha string"
    else:
        out_schema = input_schema.add("content_sha", "string")
    # applyInPandasWithState hands the UDF every column of `hashed`
    # (grouping column included), so the output schema is input + sha.
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
