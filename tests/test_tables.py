"""Iceberg-ready table layer: pinned DDL + partitioned-parquet fallback.

The sandbox has no Iceberg runtime jar, so `fmt="auto"` must land on the
parquet fallback with the same layout (identity dirs verbatim, bucket(N)
as a derived `<col>_bucket` dir) and `read_table` must round-trip with
partition pruning intact.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigmatch_utilities_spark.plans.tables import (
    REPO_FILES_SPEC,
    PartitionField,
    iceberg_ddl,
    read_table,
    write_table,
)


@pytest.fixture()
def repo_files(spark):
    rows = [
        (f"org/repo{i % 5}", f"src/f{i}.py", f"c{i:04d}", ("py", "js")[i % 2], f"body {i}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_iceberg_ddl_pinned(repo_files):
    ddl = iceberg_ddl("lake.repo_files", repo_files)
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS lake.repo_files (\n"
        "  repo STRING,\n"
        "  path STRING,\n"
        "  commit STRING,\n"
        "  lang STRING,\n"
        "  content STRING\n"
        ")\n"
        "USING iceberg\n"
        "PARTITIONED BY (lang, bucket(16, repo))"
    )


def test_partition_field_validation():
    with pytest.raises(ValueError):
        PartitionField("repo", "bucket", 0)
    with pytest.raises(ValueError):
        PartitionField("repo", "hour")


def test_auto_falls_back_to_parquet_with_layout(repo_files, tmp_path):
    target = str(tmp_path / "repo_files")
    fmt = write_table(repo_files, target, fmt="auto")
    assert fmt == "parquet"
    # layout: lang=<v>/repo_bucket=<n>/ directories
    langs = sorted(d for d in os.listdir(target) if d.startswith("lang="))
    assert langs == ["lang=js", "lang=py"]
    buckets = [d for d in os.listdir(os.path.join(target, "lang=py")) if d.startswith("repo_bucket=")]
    assert buckets, "bucket transform must materialize repo_bucket=<n> dirs"
    assert all(0 <= int(b.split("=")[1]) < 16 for b in buckets)


def test_fallback_roundtrip_and_bucket_consistency(spark, repo_files, tmp_path):
    target = str(tmp_path / "repo_files")
    write_table(repo_files, target, fmt="parquet")
    back = read_table(spark, target, fmt="parquet")
    # all original columns survive, plus the derived partition column
    assert set(back.columns) == {"repo", "path", "commit", "lang", "content", "repo_bucket"}
    assert back.count() == 40
    # every row of a given repo landed in one bucket (co-location holds)
    per_repo = back.groupBy("repo").agg(F.countDistinct("repo_bucket").alias("nb")).collect()
    assert all(r.nb == 1 for r in per_repo)


def test_partition_pruning_reaches_scan(spark, repo_files, tmp_path):
    target = str(tmp_path / "repo_files")
    write_table(repo_files, target, fmt="parquet")
    back = read_table(spark, target, fmt="parquet").filter(F.col("lang") == "py")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == 20


def test_iceberg_fmt_raises_without_catalog(repo_files, tmp_path):
    with pytest.raises(Exception):
        write_table(repo_files, str(tmp_path / "t"), fmt="iceberg")


def test_auto_reraises_non_missing_iceberg_errors(repo_files, tmp_path, monkeypatch):
    """ADVICE r3: fmt='auto' may fall back ONLY when the session lacks
    Iceberg support — a transient catalog/commit failure must re-raise,
    never silently divert the write to a local parquet dir."""

    class _FailingWriter:
        def using(self, *_):
            return self

        def partitionedBy(self, *_):
            return self

        def createOrReplace(self):
            raise RuntimeError("CommitFailedException: concurrent update to table")

        def append(self):
            raise RuntimeError("CommitFailedException: concurrent update to table")

    monkeypatch.setattr(
        type(repo_files), "writeTo", lambda self, t: _FailingWriter()
    )
    with pytest.raises(RuntimeError, match="CommitFailedException"):
        write_table(repo_files, str(tmp_path / "t"), fmt="auto")
    assert not (tmp_path / "t").exists()  # nothing was written anywhere


def test_read_table_auto_falls_back_on_path(spark, repo_files, tmp_path):
    target = str(tmp_path / "repo_files")
    write_table(repo_files, target, fmt="auto")
    assert read_table(spark, target, fmt="auto").count() == 40


def test_lang_filtered_linkage_pass_prunes_partitions(spark, repo_files, tmp_path):
    """VERDICT r4 item 9: a linkage blocking pass over the written table,
    restricted to one language, must prune lang partitions at the scan —
    both the plan's PartitionFilters and the actual files-read count."""
    from bigmatch_utilities_spark.config import (
        BlockField,
        BlockingPassSpec,
        MatchField,
    )
    from bigmatch_utilities_spark.operators.blocking import candidate_pairs

    target = str(tmp_path / "repo_files")
    write_table(repo_files, target, fmt="auto")
    tbl = read_table(spark, target, fmt="parquet")
    recs = tbl.filter(F.col("lang") == "py").select(
        F.col("commit").alias("id"), "repo", "path", "content"
    )
    spec = BlockingPassSpec(
        block_fields=(BlockField(name="repo"),),
        match_fields=(MatchField(name="path", comparator="c"),),
    )
    pairs = candidate_pairs(recs, recs, spec, "id", dedupe=True)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:300]
    # files actually read < files on disk (the js half is never touched)
    import os

    total_files = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(target)
    )
    scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln or "Scan parquet" in ln
    ]
    assert scans, plan
    assert pairs.count() >= 0  # plan executes
    # pruned-file proof: input_file_name() enumerates the files the pruned
    # scan actually reads — strictly fewer than the files on disk
    n_read = (
        tbl.filter(F.col("lang") == "py")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert 0 < n_read < total_files


def test_append_mode(spark, repo_files, tmp_path):
    target = str(tmp_path / "repo_files")
    write_table(repo_files, target, fmt="parquet")
    write_table(repo_files.limit(5), target, fmt="parquet", mode="append")
    assert read_table(spark, target, fmt="parquet").count() == 45


def test_spec_default_is_north_rule():
    assert [(p.column, p.transform, p.n) for p in REPO_FILES_SPEC] == [
        ("lang", "identity", 0),
        ("repo", "bucket", 16),
    ]


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Two tables bucketed on the join key at the same bucket count must
    sort-merge-join with NO Exchange on either side — the co-location
    contract write_bucketed exists for."""
    from bigmatch_utilities_spark.plans.tables import write_bucketed

    a = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") * 3 % 11).alias("w")
    )
    write_bucketed(a, "bt_assign", ["id"], 8)
    write_bucketed(b, "bt_pairs", ["id"], 8)
    try:
        ta = spark.table("bt_assign")
        tb = spark.table("bt_pairs")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ta.join(tb, "id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert j.count() == 2000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_assign")
        spark.sql("DROP TABLE IF EXISTS bt_pairs")


def test_bucketed_one_side_shuffles_only_other(spark):
    """A bucketed standing table joined to an unbucketed delta: the
    standing scan stays in place; only the delta side exchanges — the
    nightly-incremental join shape."""
    from bigmatch_utilities_spark.plans.tables import write_bucketed

    standing = spark.range(0, 4000).select(F.col("id"), F.lit("s").alias("side"))
    write_bucketed(standing, "bt_standing", ["id"], 8)
    try:
        delta = spark.range(0, 100).select(F.col("id"), F.lit("d").alias("dside"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bt_standing").join(delta, "id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            # exactly one Exchange (the delta side), none above the bucketed scan
            assert plan.count("Exchange hashpartitioning") == 1, plan
            assert j.count() == 100
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_standing")
