"""Per-pass checkpointing, lineage markers, and metrics.

The reference has no resumability — a failed BigMatch run is simply rerun.
The north rule requires idempotent resume with per-partition lineage +
metrics, supplied here as driver-side orchestration:

* each pass's pairs land in ``<out>/pairs/pass=NN/`` (partitioned layout —
  an Iceberg table partition spec in production; plain parquet dirs here);
* a pass is complete iff its **marker** ``<out>/markers/pass_NN.json``
  exists. Markers are written atomically (tmp + rename) *after* the data
  commit, so a crash between data write and marker write re-runs the pass —
  the parquet overwrite makes that idempotent;
* metrics rows (pass, rows, pairs, wall seconds, partitions) append to
  ``<out>/metrics/`` — the lineage/metrics table.

On restart, completed passes are read back from their parquet instead of
recomputed: resume cost is O(completed output), not O(input).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigmatch_utilities_spark.config import MatchConfig
from bigmatch_utilities_spark.operators.pipeline import (
    MatchResult,
    first_pass_wins,
    score_pass,
)


class CheckpointedMatch:
    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        os.makedirs(f"{self.out}/markers", exist_ok=True)

    # -- markers ---------------------------------------------------------
    def _marker_path(self, pass_id: int) -> str:
        return f"{self.out}/markers/pass_{pass_id:02d}.json"

    def pass_complete(self, pass_id: int) -> bool:
        return os.path.exists(self._marker_path(pass_id))

    def _write_marker(self, pass_id: int, payload: dict) -> None:
        path = self._marker_path(pass_id)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)  # atomic on POSIX

    # -- metrics ---------------------------------------------------------
    def _append_metrics(self, payload: dict | list[dict]) -> None:
        rows = payload if isinstance(payload, list) else [payload]
        self.spark.createDataFrame(rows).write.mode("append").json(
            f"{self.out}/metrics"
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.json(f"{self.out}/metrics")

    # -- the resumable run ------------------------------------------------
    def run(
        self,
        rec: DataFrame,
        mem: DataFrame | None,
        config: MatchConfig,
        id_col: str | None = None,
        **pass_kwargs,
    ) -> MatchResult:
        id_col = id_col or config.id_field.name
        dedupe = mem is None or config.dedupe_single_file
        if mem is None:
            mem = rec
        rec = rec.persist()
        if mem is not rec:
            mem = mem.persist()

        per_pass: list[DataFrame] = []
        for k, spec in enumerate(config.passes):
            pairs_path = f"{self.out}/pairs/pass={k:02d}"
            if self.pass_complete(k):
                per_pass.append(self.spark.read.parquet(pairs_path))
                continue
            t0 = time.time()
            scored = score_pass(
                rec, mem, spec, k, id_col, dedupe=dedupe, **pass_kwargs
            )
            scored.write.mode("overwrite").parquet(pairs_path)
            df = self.spark.read.parquet(pairs_path)
            # per-partition lineage: one metrics row per output partition
            # (file) of the pass, so a resume/audit can account for every
            # unit of completed work, not just the pass total.
            part_rows = [
                r.asDict()
                for r in df.groupBy(
                    F.spark_partition_id().alias("partition")
                )
                .agg(F.count(F.lit(1)).alias("rows"))
                .collect()
            ]
            n_pairs = sum(p["rows"] for p in part_rows)
            wall = time.time() - t0
            ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            rows = [
                {
                    "kind": "pass",
                    "pass_id": k,
                    "partition": -1,
                    "rows": n_pairs,
                    "wall_s": float(wall),
                    "partitions": int(len(part_rows)),
                    "ts": ts,
                }
            ] + [
                {
                    "kind": "partition",
                    "pass_id": k,
                    "partition": int(p["partition"]),
                    "rows": int(p["rows"]),
                    "wall_s": float(wall),
                    "partitions": int(len(part_rows)),
                    "ts": ts,
                }
                for p in part_rows
            ]
            self._append_metrics(rows)
            self._write_marker(k, {"pairs": n_pairs, "wall_s": wall})
            per_pass.append(df)

        # Same slim union as pipeline.run_match: the per-pass parquet keeps
        # the full carried rec_*/mem_* values (that's what review emitters
        # and resumes read), but MatchResult.pairs is the decision core in
        # BOTH modes — one output contract, and the first-pass-wins shuffle
        # moves ~50 B rows instead of ~500 B.
        core = None
        for df in per_pass:
            slim = df.select(
                "id_rec", "id_mem", "pass_id", "weight", "is_exact", "decision"
            )
            core = slim if core is None else core.unionByName(slim)
        pairs = first_pass_wins(core)
        exact = pairs.filter(F.col("is_exact") & (F.col("decision") != "below"))
        accepted = pairs.filter(
            (~F.col("is_exact"))
            & (
                (F.col("decision") == "match")
                | (
                    (F.col("decision") == "possible")
                    & (F.col("weight") >= F.lit(float(config.accept_threshold)))
                )
            )
        )
        possible = pairs.filter(
            (~F.col("is_exact"))
            & (F.col("decision") == "possible")
            & (F.col("weight") < F.lit(float(config.accept_threshold)))
        )
        return MatchResult(pairs=pairs, exact=exact, accepted=accepted, possible=possible)
