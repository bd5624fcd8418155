"""Resumability: identical final output after interruption; completed
passes are not re-executed."""

from __future__ import annotations

from pathlib import Path

from bigmatch_utilities_spark.config import parse_datadict, parse_parmf
from bigmatch_utilities_spark.operators.pipeline import normalize, run_match
from bigmatch_utilities_spark.plans.checkpoint import CheckpointedMatch
from bigmatch_utilities_spark.sources.fixed_width import read_fixed_width

GS = "/root/reference/samplefiles/gs"


def _inputs(spark):
    cfg = parse_parmf(Path(f"{GS}/parmf.txt").read_text())
    rec = normalize(
        read_fixed_width(
            spark,
            f"{GS}/sample_fixedwidth.txt",
            parse_datadict(Path(f"{GS}/sample_fixed_width.dict.csv").read_text()),
        )
    )
    mem = normalize(
        read_fixed_width(
            spark,
            f"{GS}/sample2_fixedwidth.txt",
            parse_datadict(Path(f"{GS}/sample2_fixed_width.dict.csv").read_text()),
        )
    )
    return cfg, rec, mem


def _pairs_set(result):
    return {
        (r["id_rec"], r["id_mem"], r["pass_id"], round(r["weight"], 9))
        for r in result.pairs.collect()
    }


def test_checkpointed_run_matches_direct(spark, tmp_path):
    cfg, rec, mem = _inputs(spark)
    direct = _pairs_set(run_match(rec, mem, cfg, id_col="id"))
    ckpt = CheckpointedMatch(spark, str(tmp_path / "run1"))
    resumable = _pairs_set(ckpt.run(rec, mem, cfg, id_col="id"))
    assert resumable == direct


def test_resume_skips_completed_passes(spark, tmp_path):
    cfg, rec, mem = _inputs(spark)
    out = str(tmp_path / "run2")

    ckpt = CheckpointedMatch(spark, out)
    full = _pairs_set(ckpt.run(rec, mem, cfg, id_col="id"))
    assert all(ckpt.pass_complete(k) for k in range(len(cfg.passes)))

    # simulate a crash after pass 0: delete markers+data of passes 1..2
    import shutil, os

    for k in (1, 2):
        os.remove(f"{out}/markers/pass_{k:02d}.json")
        shutil.rmtree(f"{out}/pairs/pass={k:02d}")

    # resume with a POISONED pass-0 input: if pass 0 re-ran, its output
    # would change; because the marker exists it must be read from parquet.
    poisoned_rec = rec.limit(0)
    ckpt2 = CheckpointedMatch(spark, out)
    resumed = ckpt2.run(rec, mem, cfg, id_col="id")
    assert _pairs_set(resumed) == full

    poisoned = CheckpointedMatch(spark, out)
    # wipe only pass 1 again, then run with empty rec: pass 0 and 2 have
    # markers; pass 1 re-runs on the poisoned input and yields 0 pairs.
    os.remove(f"{out}/markers/pass_01.json")
    shutil.rmtree(f"{out}/pairs/pass=01")
    partial = poisoned.run(poisoned_rec, mem, cfg, id_col="id")
    got = _pairs_set(partial)
    want_pass_ids = {p for (_, _, p, _) in got}
    assert 1 not in want_pass_ids  # pass 1 produced nothing (poisoned)
    assert {0, 2} & want_pass_ids  # checkpointed passes came from disk


def test_file_uri_markers_via_hadoop_fs(spark, tmp_path):
    """Markers must work through the Hadoop FileSystem layer (file: URI —
    the same code path hdfs:/s3a: paths take on a cluster), not driver
    os.* calls."""
    cfg, rec, mem = _inputs(spark)
    out = f"file://{tmp_path}/run_uri"
    ckpt = CheckpointedMatch(spark, out)
    full = _pairs_set(ckpt.run(rec, mem, cfg, id_col="id"))
    assert full
    assert all(ckpt.pass_complete(k) for k in range(len(cfg.passes)))
    # marker payloads are readable back through the FS API
    for k in range(len(cfg.passes)):
        m = ckpt.read_marker(k)
        assert m is not None and m["pairs"] >= 0 and m["wall_s"] > 0
    # resume off the URI path skips completed passes even with poisoned input
    resumed = CheckpointedMatch(spark, out).run(rec.limit(0), mem, cfg, id_col="id")
    assert _pairs_set(resumed) == full


def test_sliced_run_matches_direct(spark, tmp_path):
    """slices>1 shards each pass by blocking-key hash; the union over
    slices must be exactly the unsliced result (blocks never straddle a
    slice, so pairs and per-block guardrails are identical)."""
    cfg, rec, mem = _inputs(spark)
    direct = _pairs_set(run_match(rec, mem, cfg, id_col="id"))
    ckpt = CheckpointedMatch(spark, str(tmp_path / "run_sliced"))
    sliced = _pairs_set(ckpt.run(rec, mem, cfg, id_col="id", slices=3))
    assert sliced == direct
    assert all(ckpt.pass_complete(k) for k in range(len(cfg.passes)))
    assert all(
        ckpt.slice_complete(k, s)
        for k in range(len(cfg.passes))
        for s in range(3)
    )


def test_mid_pass_failure_resumes_at_slice_granularity(spark, tmp_path, monkeypatch):
    """Kill the run after k slices of pass 0: the resume must re-score
    ONLY the incomplete slices (no duplicated work — counted via a
    score_pass spy) and still produce the exact full result."""
    from bigmatch_utilities_spark.plans import checkpoint as ck_mod

    cfg, rec, mem = _inputs(spark)
    out = str(tmp_path / "run_kill")
    slices = 4
    real_score = ck_mod.score_pass
    calls = {"n": 0}

    def dying_score(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:  # die mid-pass-0, after 2 of 4 slices committed
            raise RuntimeError("injected straggler failure")
        return real_score(*a, **kw)

    monkeypatch.setattr(ck_mod, "score_pass", dying_score)
    ckpt = CheckpointedMatch(spark, out)
    try:
        ckpt.run(rec, mem, cfg, id_col="id", slices=slices)
        raise AssertionError("injected failure did not fire")
    except RuntimeError:
        pass
    assert not ckpt.pass_complete(0)
    done = [s for s in range(slices) if ckpt.slice_complete(0, s)]
    assert len(done) == 2

    # resume: only the remaining units run — 2 of pass 0, then 4+4.
    monkeypatch.setattr(ck_mod, "score_pass", real_score)
    counting = {"n": 0}

    def counting_score(*a, **kw):
        counting["n"] += 1
        return real_score(*a, **kw)

    monkeypatch.setattr(ck_mod, "score_pass", counting_score)
    resumed = CheckpointedMatch(spark, out).run(
        rec, mem, cfg, id_col="id", slices=slices
    )
    assert counting["n"] == slices * len(cfg.passes) - 2  # no duplicated work
    direct = _pairs_set(run_match(rec, mem, cfg, id_col="id"))
    assert _pairs_set(resumed) == direct


def test_resume_with_different_slice_count_fails_fast(
    spark, tmp_path, monkeypatch
):
    """ADVICE r3: a partially completed sliced pass pins its slice count in
    a sidecar; resuming with a different --slices must raise instead of
    silently mixing hash-mod layouts (which would duplicate some blocks'
    pairs and drop others)."""
    import pytest

    from bigmatch_utilities_spark.plans import checkpoint as ck_mod

    cfg, rec, mem = _inputs(spark)
    out = str(tmp_path / "run_slicemix")
    real_score = ck_mod.score_pass
    calls = {"n": 0}

    def dying_score(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 1:  # die after 1 of 4 slices committed
            raise RuntimeError("injected failure")
        return real_score(*a, **kw)

    monkeypatch.setattr(ck_mod, "score_pass", dying_score)
    with pytest.raises(RuntimeError):
        CheckpointedMatch(spark, out).run(rec, mem, cfg, id_col="id", slices=4)
    monkeypatch.setattr(ck_mod, "score_pass", real_score)

    with pytest.raises(ValueError, match="slices=4"):
        CheckpointedMatch(spark, out).run(rec, mem, cfg, id_col="id", slices=8)

    # the original slice count still resumes cleanly to the exact result
    resumed = CheckpointedMatch(spark, out).run(
        rec, mem, cfg, id_col="id", slices=4
    )
    direct = _pairs_set(run_match(rec, mem, cfg, id_col="id"))
    assert _pairs_set(resumed) == direct


def test_metrics_table(spark, tmp_path):
    cfg, rec, mem = _inputs(spark)
    ckpt = CheckpointedMatch(spark, str(tmp_path / "run3"))
    ckpt.run(rec, mem, cfg, id_col="id")
    m = ckpt.metrics().collect()
    assert {r["pass_id"] for r in m} == {0, 1, 2}
    assert all(r["wall_s"] > 0 for r in m)
    assert all(r["partitions"] >= 1 for r in m)
