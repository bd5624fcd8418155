"""Streaming windowed aggregation: drained-stream == batch on closed
windows, integer micro sums, and the DuckDB time_bucket twin."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from bigmatch_utilities_spark.streaming.windowed import (
    run_windowed_counts,
    windowed_event_counts,
    windowed_event_counts_sql,
)


def _events(spark):
    base = dt.datetime(2024, 3, 1)
    rows = []
    for d in range(5):
        for i in range(10):
            rows.append(
                (
                    base + dt.timedelta(days=d, minutes=7 * i),
                    "click" if i % 2 == 0 else "view",
                    0.1 * i + d,
                )
            )
    return spark.createDataFrame(
        rows, "ts timestamp, event_type string, value double"
    )


def test_stream_drain_equals_batch_on_closed_windows(spark, tmp_path):
    ev = _events(spark)
    inp, out, ckpt = (str(tmp_path / n) for n in ("in", "out", "ckpt"))
    ev.write.mode("overwrite").parquet(inp)
    run_windowed_counts(
        spark,
        inp,
        "ts timestamp, event_type string, value double",
        out,
        ckpt,
        window="1 day",
        watermark="0 seconds",
    )
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = sorted(
        tuple(r)
        for r in windowed_event_counts(ev)
        .filter(F.col("win_start") + F.expr("INTERVAL 1 DAY") <= F.lit(max_ts))
        .collect()
    )
    # append mode emits exactly the watermark-closed windows; the final
    # partial day is held back — the documented contract
    assert got == want
    assert len(got) == 4 * 2  # 4 closed days x 2 event types


def test_batch_path_matches_duckdb_twin(spark, tmp_path):
    ev = _events(spark)
    pq = str(tmp_path / "ev.parquet")
    ev.write.mode("overwrite").parquet(pq)
    got = sorted(
        (str(r.win_start), r.event_type, r.n, r.sum_value_micro)
        for r in windowed_event_counts(ev).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = sorted(
        (str(r[0]), r[1], r[2], r[3])
        for r in con.execute(windowed_event_counts_sql("events")).fetchall()
    )
    assert got == want


def test_resume_is_exactly_once(spark, tmp_path):
    ev = _events(spark)
    inp, out, ckpt = (str(tmp_path / n) for n in ("in", "out", "ckpt"))
    ev.write.mode("overwrite").parquet(inp)
    args = (
        spark, inp, "ts timestamp, event_type string, value double", out, ckpt,
    )
    run_windowed_counts(*args, window="1 day", watermark="0 seconds")
    n1 = spark.read.parquet(out).count()
    # re-drain off the same checkpoint: no new input -> no duplicate rows
    run_windowed_counts(*args, window="1 day", watermark="0 seconds")
    n2 = spark.read.parquet(out).count()
    assert n1 == n2
