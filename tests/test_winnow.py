"""Winnowing fingerprint tests: guarantee property, edge lengths, oracle
parity of the staged SQL, and the no-inline plan invariant."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.winnow import (
    winnow_cte_sql,
    winnow_profile,
    winnow_shared_pairs,
    with_winnow_fingerprints,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away"),
    (2, "prefix stuff then the quick brown fox jumps over the lazy dog and runs far away"),
    (3, "completely different text about spark engines and shuffles here"),
    (4, "xy"),  # shorter than k: no k-gram fits
    (5, "exactly twelve"),  # a few k-grams, fewer than w windows
    (6, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_winnow_guarantee_shared_substring(spark):
    """Docs 1 and 2 share a >= w+k-1 char substring → MUST share >= 1
    fingerprint (the winnowing guarantee); doc 3 shares none."""
    rows = with_winnow_fingerprints(_docs(spark), "text", "fps").collect()
    fps = {r["doc_id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])


def test_winnow_edge_lengths(spark):
    rows = with_winnow_fingerprints(_docs(spark), "text", "fps").collect()
    fps = {r["doc_id"]: r["fps"] for r in rows}
    assert fps[4] == [] and fps[6] == []
    # fewer k-grams than a window: exactly one fingerprint (min of all)
    assert len(fps[5]) == 1


def test_winnow_profile_oracle_parity(spark, tmp_path):
    df = _docs(spark)
    pq = str(tmp_path / "docs.parquet")
    df.write.parquet(pq)
    got = {
        r["id"]: (r["n_fps"], r["fp_checksum"])
        for r in winnow_profile(df, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.sql(f"create view d as select * from '{pq}/*.parquet'")
    cte = winnow_cte_sql("d", "text", "doc_id")
    want = {
        r[0]: (r[1], r[2] if r[2] is not None else 0)
        for r in con.sql(
            f"WITH {cte} SELECT id, CAST(len(fps) AS INT), "
            f"CAST(coalesce(list_sum(fps), 0) AS BIGINT) FROM wn_fps"
        ).fetchall()
    }
    assert got == want


def test_winnow_shared_pairs(spark):
    pairs = {
        (r["id_l"], r["id_r"]): r["shared"]
        for r in winnow_shared_pairs(
            _docs(spark), "text", "doc_id", min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any({a, b} == {1, 3} for a, b in pairs)


def test_winnow_guarantee_property(spark):
    """Schleimer/Wilkerson/Aiken theorem: two documents sharing a common
    substring of length >= w + k - 1 select at least one common
    fingerprint. Randomized (seeded) corpus with planted shared spans."""
    import random

    rng = random.Random(20260818)
    # letters only: whitespace would interact with the normalization at
    # the planted-span boundaries and shorten the guaranteed match
    alphabet = "abcdefghij"
    k, w = 12, 10
    span_len = w + k - 1
    rows = []
    for i in range(40):
        shared = "".join(rng.choice(alphabet) for _ in range(span_len))
        pre_a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        post_a = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        pre_b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        post_b = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        rows.append((2 * i, pre_a + shared + post_a))
        rows.append((2 * i + 1, pre_b + shared + post_b))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in with_winnow_fingerprints(df, "text", "fps", k=k, w=w).collect()
    }
    for i in range(40):
        assert fps[2 * i] & fps[2 * i + 1], f"planted pair {i} shares no fp"


def test_no_inferred_filter_reinline(spark):
    """The optimized plan of the exploded-fingerprint path must not inline
    the k-gram transform into a pushed-down Filter (the O(n²)-per-row
    recompute explode_outer exists to prevent)."""
    df = with_winnow_fingerprints(_docs(spark), "text", "fps")
    fps = df.select("doc_id", F.explode_outer("fps").alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    plan = fps._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if line.strip().startswith("+- Filter") or line.strip().startswith("Filter"):
            assert "md5" not in line, "k-gram chain re-inlined into a Filter"


def test_containment_scores_copied_paragraph_high(spark):
    """A paragraph copied into a much larger host file: symmetric shared
    count is small relative to the host, but containment (shared / min
    side) scores near 1.0 — the asymmetric MOSS case plain Jaccard buries."""
    from bigmatch_utilities_spark.operators.winnow import (
        winnow_containment_pairs,
        winnow_profile,
    )

    para = "the quick brown fox jumps over the lazy dog again and again " * 4
    host = (
        "completely different opening content with many unrelated words "
        * 20
        + para
        + " trailing host material that keeps going with more filler words "
        * 20
    )
    df = spark.createDataFrame(
        [(1, para), (2, host), (3, "unrelated third document entirely " * 10)],
        ["doc_id", "text"],
    )
    out = {
        (r["id_l"], r["id_r"]): (r["shared"], r["containment"])
        for r in winnow_containment_pairs(
            df, "text", "doc_id", max_bucket=None
        ).collect()
    }
    assert (1, 2) in out
    shared, containment = out[(1, 2)]
    n = {
        r["id"]: r["n_fps"]
        for r in winnow_profile(df, "text", "doc_id").collect()
    }
    # denominator is the SMALLER side (the paragraph), so the copied-into
    # case scores high even though the host is much larger
    assert n[2] > 2 * n[1]
    assert containment > 0.8
    assert abs(containment - round(shared / min(n[1], n[2]), 6)) < 1e-9
    # the unrelated doc pairs with nothing
    assert not any(3 in k for k in out)


def test_group_containment_detects_vendored_copy(spark):
    """A 'repo' whose one file is vendored inside a bigger repo's file
    shares nearly all its fingerprints with the host repo: the group-level
    containment flags the fork even though no file is byte-identical."""
    from bigmatch_utilities_spark.operators.winnow import group_containment_pairs

    para = "the quick brown fox jumps over the lazy dog again and again " * 4
    host = (
        "completely different opening content with many unrelated words " * 20
        + para
        + " trailing host material that keeps going with more filler words " * 20
    )
    df = spark.createDataFrame(
        [
            (1, para, "lib"),
            (2, host, "vendor_of_lib"),
            (3, "its own second file with separate content here " * 8, "vendor_of_lib"),
            (4, "unrelated repository content entirely " * 10, "other"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r.group_l, r.group_r): r.containment
        for r in group_containment_pairs(
            df, "text", "doc_id", "source", min_shared=1
        ).collect()
    }
    assert out[("lib", "vendor_of_lib")] > 0.9
    assert ("lib", "other") not in out


def test_group_containment_oracle_parity(spark, tmp_path):
    from bigmatch_utilities_spark.operators.winnow import (
        group_containment_pairs,
        group_containment_sql,
    )

    rows = [
        (i, f"doc number {i % 4} shared body text repeated here " * (3 + i % 3), f"g{i % 3}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    p = str(tmp_path / "g.parquet")
    df.write.mode("overwrite").parquet(p)
    got = sorted(
        tuple(r)
        for r in group_containment_pairs(
            df, "text", "doc_id", "source", min_shared=1, max_df=2
        ).collect()
    )
    sql = group_containment_sql(
        f"read_parquet('{p}/*.parquet')", "text", "source", min_shared=1, max_df=2
    )
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want
