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
* ``slices > 1`` splits each pass into that many **partition-level resume
  units**: the blocking-key space is hashed into `slices` disjoint shards,
  each scored and committed independently to
  ``pairs/pass=NN/slice=SS`` with its own marker
  ``pass_NN_slice_SS.json`` — a straggler failure mid-pass resumes at
  slice granularity instead of re-running the pass. Slicing by BLOCK KEY
  (not by row) keeps every per-block guardrail — blank flags, size caps,
  star emission, adaptive shard counts — bit-identical to the unsliced
  plan, because a block lives wholly inside one slice; the union over
  slices is therefore exactly the full pass output;
* metrics rows (pass, slice, rows, pairs, wall seconds, partitions)
  append to ``<out>/metrics/`` — the lineage/metrics table.

On restart, completed passes/slices are read back from their parquet
instead of recomputed: resume cost is O(completed output), not O(input).
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
    def _marker_path(self, pass_id: int, slice_id: int | None = None) -> str:
        if slice_id is None:
            return f"{self.out}/markers/pass_{pass_id:02d}.json"
        return f"{self.out}/markers/pass_{pass_id:02d}_slice_{slice_id:02d}.json"

    def pass_complete(self, pass_id: int) -> bool:
        p = self._marker_path(pass_id)
        return self._fs(p).exists(self._hpath(p))

    def slice_complete(self, pass_id: int, slice_id: int) -> bool:
        p = self._marker_path(pass_id, slice_id)
        return self._fs(p).exists(self._hpath(p))

    def read_marker(self, pass_id: int) -> dict | None:
        return self._read_json(self._marker_path(pass_id))

    def _read_json(self, p: str) -> dict | None:
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

    def _write_marker(
        self, pass_id: int, payload: dict, slice_id: int | None = None
    ) -> None:
        self._write_json(self._marker_path(pass_id, slice_id), payload)

    def _write_json(self, path: str, payload: dict) -> None:
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

    def _record_unit(
        self, df: DataFrame, pass_id: int, slice_id: int | None, wall: float
    ) -> int:
        """Per-partition lineage for one committed unit (a pass, or one
        slice of it): one metrics row per output partition plus a unit
        total, so a resume/audit can account for every piece of completed
        work. Returns the unit's pair count."""
        part_rows = [
            r.asDict()
            for r in df.groupBy(F.spark_partition_id().alias("partition"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        n_pairs = sum(p["rows"] for p in part_rows)
        ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        sl = -1 if slice_id is None else int(slice_id)
        rows = [
            {
                "kind": "pass" if slice_id is None else "slice",
                "pass_id": pass_id,
                "slice": sl,
                "partition": -1,
                "rows": n_pairs,
                "wall_s": float(wall),
                "partitions": int(len(part_rows)),
                "ts": ts,
            }
        ] + [
            {
                "kind": "partition",
                "pass_id": pass_id,
                "slice": sl,
                "partition": int(p["partition"]),
                "rows": int(p["rows"]),
                "wall_s": float(wall),
                "partitions": int(len(part_rows)),
                "ts": ts,
            }
            for p in part_rows
        ]
        self._append_metrics(rows)
        return n_pairs

    # -- the resumable run ------------------------------------------------
    def run(
        self,
        rec: DataFrame,
        mem: DataFrame | None,
        config: MatchConfig,
        id_col: str | None = None,
        slices: int = 1,
        **pass_kwargs,
    ) -> MatchResult:
        """``slices > 1`` turns each pass into `slices` independently
        committed resume units sharded by blocking-key hash (see module
        docstring): a crash re-runs only the incomplete slices. The
        result is provably identical to the unsliced run because every
        block — and therefore every candidate pair and every per-block
        guardrail decision — falls in exactly one slice."""
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
                df = self.spark.read.parquet(pairs_path)
                per_pass.append(df.drop("slice") if "slice" in df.columns else df)
                continue
            if slices <= 1:
                t0 = time.time()
                scored = score_pass(
                    rec, mem, spec, k, id_col, dedupe=dedupe, **pass_kwargs
                )
                scored.write.mode("overwrite").parquet(pairs_path)
                df = self.spark.read.parquet(pairs_path)
                n_pairs = self._record_unit(df, k, None, time.time() - t0)
                self._write_marker(k, {"pairs": n_pairs, "wall_s": time.time() - t0})
                per_pass.append(df)
                continue

            # blocking-key hash shard: both join sides restricted to the
            # same slice of the key space. NULL-safe: blank/absent keys
            # hash via the '' coalesce, and blank_flag rows are dropped
            # inside score_pass exactly as in the unsliced plan.
            key_cols = [
                F.coalesce(F.col(bf.name).cast("string"), F.lit(""))
                for bf in spec.block_fields
            ]
            # The hash-mod layout is only resumable at the SAME slice
            # count: a sidecar written before the first slice pins it, and
            # a resume with a different --slices fails fast instead of
            # silently skipping/duplicating blocks whose shard assignment
            # moved (ADVICE r3).
            slices_sidecar = f"{self.out}/markers/pass_{k:02d}_slices.json"
            pinned = self._read_json(slices_sidecar)
            if pinned is None:
                self._write_json(slices_sidecar, {"slices": int(slices)})
            elif int(pinned["slices"]) != int(slices):
                raise ValueError(
                    f"pass {k}: resuming with slices={slices}, but this "
                    f"pass's existing slice markers were written with "
                    f"slices={pinned['slices']} — the blocking-key "
                    "hash-mod layout differs, so completed slices would "
                    "not line up. Resume with the original value, or "
                    f"delete {pairs_path} and {self.out}/markers/"
                    f"pass_{k:02d}* to restart the pass."
                )
            slice_of = F.pmod(F.xxhash64(*key_cols), F.lit(slices))
            total_pairs = 0
            for s in range(slices):
                slice_path = f"{pairs_path}/slice={s:02d}"
                if self.slice_complete(k, s):
                    continue
                t0 = time.time()
                rec_s = rec.filter(slice_of == s)
                mem_s = rec_s if mem is rec else mem.filter(slice_of == s)
                scored = score_pass(
                    rec_s, mem_s, spec, k, id_col, dedupe=dedupe, **pass_kwargs
                )
                scored.write.mode("overwrite").parquet(slice_path)
                df_s = self.spark.read.parquet(slice_path)
                n = self._record_unit(df_s, k, s, time.time() - t0)
                self._write_marker(
                    k,
                    {"pairs": n, "wall_s": time.time() - t0, "slices": int(slices)},
                    slice_id=s,
                )
            # pass marker after every slice committed: pass_complete stays
            # the fast whole-pass check on later resumes.
            df = self.spark.read.parquet(pairs_path).drop("slice")
            total_pairs = df.count()
            self._write_marker(k, {"pairs": total_pairs, "slices": slices})
            per_pass.append(df)

        # Same slim union as pipeline.run_match: the per-pass parquet keeps
        # the full carried rec_*/mem_* values (that's what review emitters
        # and resumes read), but MatchResult.pairs is the decision core in
        # BOTH modes — one output contract, and the first-pass-wins shuffle
        # moves ~50 B rows instead of ~500 B.
        core = None
        for df in per_pass:
            slim = df.select(
                "id_rec", "id_mem", "pass_id", "weight", "is_exact", "decision",
                # gamma indicator columns (score_pass gamma_fields=...) ride
                # the slim union so EM reads them off result.pairs directly
                *[c for c in df.columns if c.startswith("g_")],
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
