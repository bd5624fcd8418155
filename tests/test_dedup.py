"""Dedup operator tests: exact, MinHash-LSH, Jaccard, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigmatch_utilities_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_candidates,
    simhash_candidates,
    word_shingles,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),  # near dup
    (4, "completely different text about spark engines here"),
    (5, "totally unrelated content with many novel words inside"),
    (6, "the quick brown fox jumps over the lazy dog today"),  # near dup
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(spark):
    groups = exact_duplicates(_docs(spark), "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 1


def test_dedup_exact_keeps_min_id(spark):
    kept = dedup_exact(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6]
    # VERDICT r4 item 7: the keep-one plan is groupBy+semi-join, never a
    # whole-row window sort on the big side
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan


def test_word_shingles(spark):
    df = spark.range(1).select(F.lit("a b c d").alias("t"))
    got = df.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert sorted(got) == ["a b c", "b c d"]
    short = spark.range(1).select(F.lit("a b").alias("t"))
    got = short.select(word_shingles(F.col("t"), 3).alias("s")).collect()[0]["s"]
    assert got == ["a b"]


def test_minhash_finds_near_dups(spark):
    cands = {
        (r["id_l"], r["id_r"])
        for r in minhash_candidates(
            _docs(spark), "text", "doc_id", shingle_k=2, bands=8, rows_per_band=2
        ).collect()
    }
    assert (1, 2) in cands  # exact dup always collides on every band
    assert (1, 3) in cands or (1, 6) in cands  # near dups collide
    assert (4, 5) not in cands  # unrelated


def test_jaccard_verification(spark):
    docs = _docs(spark)
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], ["id_l", "id_r"]
    )
    got = {
        (r["id_l"], r["id_r"]): r["jaccard"]
        for r in jaccard_pairs(docs, cands, "text", "doc_id", shingle_k=2, threshold=0.0).collect()
    }
    assert got[(1, 2)] == 1.0
    assert 0.4 < got[(1, 3)] < 1.0
    assert got[(4, 5)] == 0.0


def test_simhash_buckets(spark):
    cands = {
        (r["id_l"], r["id_r"])
        for r in simhash_candidates(
            _docs(spark), "text", "doc_id", bits=32, block_bits=4
        ).collect()
    }
    assert (1, 2) in cands
    assert (1, 3) in cands  # one-word change: most simhash chunks agree


def test_simhash_pairs_hamming_verification(spark):
    """Raw chunk-collision candidates are weak evidence; verification
    keeps only pairs whose FULL fingerprints are within max_hamming bits.
    Exact dups verify at hamming 0; unrelated docs that happened to share
    one chunk are rejected at a tight threshold."""
    from bigmatch_utilities_spark.operators.dedup import simhash_pairs

    docs = _docs(spark)
    cands = simhash_candidates(docs, "text", "doc_id", bits=32, block_bits=4)
    got = {
        (r["id_l"], r["id_r"]): r["hamming"]
        for r in simhash_pairs(
            docs, cands, "text", "doc_id", bits=32, max_hamming=3
        ).collect()
    }
    assert got[(1, 2)] == 0  # exact duplicate: identical fingerprint
    assert all(h <= 3 for h in got.values())
    # loosening the threshold can only add pairs (monotone in max_hamming)
    loose = simhash_pairs(docs, cands, "text", "doc_id", bits=32, max_hamming=32)
    assert loose.count() == cands.count()
    assert len(got) <= loose.count()


def test_minhash_bucket_cap(spark):
    # 20 identical docs: with max_bucket=5 the bucket is dropped entirely
    rows = [(i, "same words everywhere always") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = minhash_candidates(
        df, "text", "doc_id", shingle_k=2, bands=2, rows_per_band=2, max_bucket=5
    ).count()
    assert got == 0


def test_simhash_bucket_cap(spark):
    # 20 identical docs collapse to one bucket per band; max_bucket=5 drops
    # every one of those degenerate buckets → zero candidates.
    rows = [(i, "same words everywhere always") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = simhash_candidates(
        df, "text", "doc_id", bits=32, block_bits=4, max_bucket=5
    ).count()
    assert got == 0


def test_simhash_shard_rows_preserves_candidates(spark):
    """Adaptive bucket sharding must never change the SimHash candidate set."""
    docs = _docs(spark)
    base = {
        (r["id_l"], r["id_r"])
        for r in simhash_candidates(
            docs, "text", "doc_id", bits=32, block_bits=4
        ).collect()
    }
    assert base
    for t in (1, 2, 100):
        sharded = {
            (r["id_l"], r["id_r"])
            for r in simhash_candidates(
                docs, "text", "doc_id", bits=32, block_bits=4, shard_rows=t
            ).collect()
        }
        assert sharded == base, t


def test_minhash_shard_rows_preserves_candidates(spark):
    """Adaptive bucket sharding must never change the candidate set."""
    docs = _docs(spark)
    base = {
        (r["id_l"], r["id_r"])
        for r in minhash_candidates(
            docs, "text", "doc_id", shingle_k=2, bands=8, rows_per_band=2
        ).collect()
    }
    assert base
    for t in (1, 2, 100):
        sharded = {
            (r["id_l"], r["id_r"])
            for r in minhash_candidates(
                docs, "text", "doc_id", shingle_k=2, bands=8, rows_per_band=2,
                shard_rows=t,
            ).collect()
        }
        assert sharded == base, t


def test_bare_lsh_calls_leave_no_cache_residue(spark):
    """cache_handle=None must not persist anything: after materializing a
    bare candidates call, the context holds zero cached RDDs. Opting in
    via lsh_cache() persists during the block and cleans up on exit."""
    from bigmatch_utilities_spark.operators.dedup import lsh_cache
    from bigmatch_utilities_spark.operators.similarity import embedding_neardup

    jsc = spark.sparkContext._jsc

    def _ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    # shared session: other fixtures may legitimately hold caches, and the
    # ContextCleaner unpersists GC'd entries ASYNCHRONOUSLY — raw counts
    # can shrink mid-test. Assert on id-set DIFFERENCES instead: the
    # cleaner only removes ids, so "no NEW ids" is race-free.
    before = _ids()
    docs = _docs(spark)
    assert minhash_candidates(docs, "text", "doc_id", shingle_k=2).count() >= 0
    assert simhash_candidates(docs, "text", "doc_id", bits=32, block_bits=4).count() >= 0
    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(6)], ["vec_id", "embedding"]
    )
    assert embedding_neardup(emb, n_bands=2, bits_per_band=4, dim=8).count() >= 0
    assert _ids() - before == set()

    with lsh_cache() as caches:
        n = minhash_candidates(
            docs, "text", "doc_id", shingle_k=2, cache_handle=caches
        ).count()
        assert n >= 0 and len(caches) == 1
        added = _ids() - before
        assert len(added) == 1
    assert _ids() & added == set()


def test_near_dedup_keep_end_to_end(spark):
    from bigmatch_utilities_spark.operators.dedup import near_dedup_keep

    kept = near_dedup_keep(
        _docs(spark), "text", "doc_id", shingle_k=2, bands=8, rows_per_band=2,
        threshold=0.5,
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # docs 1/2/3/6 are one near-dup cluster (exact dup + two near dups):
    # min-id representative 1 survives; 4 and 5 are unrelated singletons
    assert ids == [1, 4, 5]


def test_lsh_pass_kind_config(spark):
    """kind='lsh': the MinHash canopy declared as a config pass — candidates
    match minhash_candidates with the same params, scored/decided like any
    pass; two-file mode and bad params refuse loudly."""
    import pytest
    from pyspark.sql import functions as F

    from bigmatch_utilities_spark.config import (
        BlockingPassSpec,
        CutoffSpec,
        FieldRef,
        MatchConfig,
        MatchField,
    )
    from bigmatch_utilities_spark.operators.dedup import minhash_candidates
    from bigmatch_utilities_spark.operators.pipeline import run_match

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy cat", "a"),
        (3, "completely different text about spark shuffles", "b"),
        (4, "the quick brown fox jumps over the lazy dog", "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    cut = CutoffSpec(hi=2.0, lo=-50.0)
    spec = BlockingPassSpec(
        kind="lsh", lsh_field="text", lsh_bands=2, lsh_rows_per_band=2,
        lsh_max_bucket=None, block_fields=(),
        match_fields=(MatchField(name="src", comparator="c", m=0.9, u=0.1),),
        cutoff=cut, print_cutoff=cut,
    )
    cfg = MatchConfig(
        passes=(spec,), id_field=FieldRef(name="doc_id"), dedupe_single_file=True
    )
    res = run_match(df, None, cfg, id_col="doc_id", persist=False)
    got = {(r.id_rec, r.id_mem) for r in res.pairs.collect()}
    want = {
        (r.id_l, r.id_r)
        for r in minhash_candidates(
            df, "text", "doc_id", bands=2, rows_per_band=2, max_bucket=None
        ).collect()
    }
    assert got == want and (1, 4) in got and (1, 3) not in got

    other = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    with pytest.raises(ValueError, match="single-file"):
        from dataclasses import replace

        run_match(
            df, other, replace(cfg, dedupe_single_file=False),
            id_col="doc_id", persist=False,
        ).pairs.collect()

    with pytest.raises(ValueError, match="lsh_field"):
        BlockingPassSpec(
            kind="lsh", block_fields=(), match_fields=(), cutoff=cut,
            print_cutoff=cut,
        )
