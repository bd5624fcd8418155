"""Phase-by-phase wall profile of run_repo_linkage at one parallelism level.

Usage: python tools/profile_linkage.py [input_parquet] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.dedup import minhash_candidates
from bigmatch_utilities_spark.operators.pipeline import run_match
from bigmatch_utilities_spark.repo_linkage import (
    ID_COL,
    _FUZZY_FIELDS,
    prepare,
    repo_match_config,
    run_repo_linkage,
)
from bigmatch_utilities_spark.session import get_spark


def main() -> None:
    inp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_input_200000"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(inp)

    t = time.time()

    def lap(name, n=None):
        nonlocal t
        print(f"{name:28s} {time.time() - t:8.1f}s   n={n}", flush=True)
        t = time.time()

    prepared = prepare(df).persist()
    lap("prepare+persist", prepared.count())

    cfg = repo_match_config()
    for k, spec in enumerate(cfg.passes):
        from bigmatch_utilities_spark.operators.pipeline import score_pass

        n = score_pass(
            prepared, prepared, spec, k, ID_COL, dedupe=True, max_block_rows=2000
        ).count()
        lap(f"pass{k} scored", n)

    cands = minhash_candidates(
        prepared, "content_norm", ID_COL, shingle_k=3, bands=8, rows_per_band=2,
        max_bucket=1000,
    )
    cands = cands.persist()
    lap("minhash candidates", cands.count())

    carry = [mf.name for mf in _FUZZY_FIELDS]
    side = prepared.select(F.col(ID_COL), *carry)
    pairs3 = cands.join(
        side.toDF(*["id_l"] + [f"rec_{c}" for c in carry]), "id_l"
    ).join(side.toDF(*["id_r"] + [f"mem_{c}" for c in carry]), "id_r")
    from bigmatch_utilities_spark.operators.scoring import pair_weight

    n = pairs3.withColumn("weight", pair_weight(_FUZZY_FIELDS)).filter(
        F.col("weight") > -1e9
    ).count()
    lap("pass3 lsh scored", n)

    result = run_repo_linkage(df, use_minhash_pass=True)
    lap("full pipeline", result.pairs.count())
    spark.stop()


if __name__ == "__main__":
    main()
