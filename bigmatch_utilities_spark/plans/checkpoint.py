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
    """Markers and metrics go through the Hadoop FileSystem API (resolved
    from the path's scheme), NOT driver-local ``os`` calls — so the same
    code resumes off ``file:``, ``hdfs:`` or ``s3a:`` paths on a real
    cluster. Marker commit = write tmp + rename (rename is atomic per
    FileSystem contract on HDFS and local FS)."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out = out_dir.rstrip("/")
        self._jvm = spark._jvm
        self._hconf = spark._jsc.hadoopConfiguration()
        self._fs(f"{self.out}/markers").mkdirs(self._hpath(f"{self.out}/markers"))

    # -- Hadoop FS plumbing ----------------------------------------------
    def _hpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._hpath(path).getFileSystem(self._hconf)

    # -- markers ---------------------------------------------------------
    def _marker_path(self, pass_id: int) -> str:
        return f"{self.out}/markers/pass_{pass_id:02d}.json"

    def pass_complete(self, pass_id: int) -> bool:
        p = self._marker_path(pass_id)
        return self._fs(p).exists(self._hpath(p))

    def read_marker(self, pass_id: int) -> dict | None:
        p = self._marker_path(pass_id)
        fs = self._fs(p)
        if not fs.exists(self._hpath(p)):
            return None
        stream = fs.open(self._hpath(p))
        try:
            ioutils = self._jvm.org.apache.commons.io.IOUtils
            data = bytes(ioutils.toByteArray(stream))
        finally:
            stream.close()
        return json.loads(data.decode("utf-8"))

    def _write_marker(self, pass_id: int, payload: dict) -> None:
        path = self._marker_path(pass_id)
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        fs = self._fs(path)
        out = fs.create(self._hpath(tmp), True)
        try:
            out.write(bytearray(json.dumps(payload).encode("utf-8")))
        finally:
            out.close()
        # HDFS rename refuses to overwrite: clear any stale marker first
        # (a marker is only rewritten when the pass re-ran after a crash
        # BETWEEN data commit and marker rename, which is idempotent).
        fs.delete(self._hpath(path), False)
        if not fs.rename(self._hpath(tmp), self._hpath(path)):
            raise IOError(f"marker rename failed: {tmp} -> {path}")

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
