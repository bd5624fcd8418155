"""parmf / parmn / data-dictionary grammar tests against every reference
sample config (grammar per /root/reference/app/BigMatchParmFile.py:405-549)."""

from __future__ import annotations

import glob
from pathlib import Path

import pytest

from bigmatch_utilities_spark.config import (
    MatchConfig,
    parse_datadict,
    parse_parmf,
    parse_parmn,
    unique_id_field,
    write_datadict,
    write_parmf,
)

SAMPLES = sorted(
    glob.glob("/root/reference/samplefiles/**/parmf*.txt", recursive=True)
) + ["/root/reference/app/parmf.txt"]


@pytest.mark.parametrize("path", SAMPLES)
def test_parse_every_reference_parmf(path):
    cfg = parse_parmf(Path(path).read_text())
    assert isinstance(cfg, MatchConfig)
    assert len(cfg.passes) >= 1
    for p in cfg.passes:
        assert len(p.block_fields) >= 1
        assert len(p.match_fields) >= 1
        for mf in p.match_fields:
            assert 0.0 < mf.u < mf.m < 1.0
            assert mf.comparator in ("c", "ci", "uo", "uoi", "p", "y", "q", "s")
    assert cfg.id_field.name


@pytest.mark.parametrize("path", SAMPLES)
def test_parmf_round_trip(path):
    cfg = parse_parmf(Path(path).read_text())
    assert parse_parmf(write_parmf(cfg)) == cfg


def test_gs_parmf_shape():
    cfg = parse_parmf(Path("/root/reference/samplefiles/gs/parmf.txt").read_text())
    assert len(cfg.passes) == 3
    assert [len(p.block_fields) for p in cfg.passes] == [3, 2, 2]
    assert [len(p.match_fields) for p in cfg.passes] == [2, 3, 3]
    p0 = cfg.passes[0]
    assert [bf.name for bf in p0.block_fields] == ["fname", "lname", "dob"]
    assert [mf.name for mf in p0.match_fields] == ["race", "gender"]
    assert all(mf.comparator == "uo" for mf in p0.match_fields)
    assert all(mf.m == 0.90 and mf.u == 0.10 for mf in p0.match_fields)
    assert cfg.id_field.name == "id"
    assert cfg.id_field.rec_start == 53 and cfg.id_field.mem_start == 41
    assert not cfg.dedupe_single_file


def test_parmn():
    mem, rec = parse_parmn(
        Path("/root/reference/samplefiles/gs/parmn.txt").read_text()
    )
    assert mem.endswith("sample2_fixedwidth.txt")
    assert rec.endswith("sample_fixedwidth.txt")


def test_datadict_parse_and_roundtrip():
    text = Path(
        "/root/reference/samplefiles/gs/sample_fixed_width.dict.csv"
    ).read_text()
    fields = parse_datadict(text)
    assert [f.name for f in fields] == [
        "fname", "mname", "lname", "race", "gender", "dob", "id",
    ]
    uid = unique_id_field(fields)
    assert uid.name == "id" and uid.start_pos == 53 and uid.width == 4
    again = parse_datadict(write_datadict(fields))
    assert again == fields


def test_datadict_header_variants():
    text = "columnname,startpos,width,seq_yn\nfoo,1,5,\nbar,6,3,y\n"
    fields = parse_datadict(text)
    assert fields[0].name == "foo" and fields[1].is_unique_id


def test_edit_comparator_config_reachable():
    """e/ei validate in MatchField and survive a parmf round-trip — the
    comparator grammar position is just another method token
    (app/BigMatchParmFile.py:472-506)."""
    from bigmatch_utilities_spark.config import (
        BlockingPassSpec,
        BlockField,
        FieldRef,
        MatchConfig,
        MatchField,
    )

    mf = MatchField(name="path", comparator="e", m=0.9, u=0.05)
    mfi = MatchField(name="path", comparator="ei", m=0.9, u=0.05)
    cfg = MatchConfig(
        passes=(
            BlockingPassSpec(
                block_fields=(BlockField(name="lang"),),
                match_fields=(mf, mfi),
            ),
        ),
        id_field=FieldRef(name="record_id"),
    )
    assert parse_parmf(write_parmf(cfg)).passes[0].match_fields[0].comparator == "e"
    assert parse_parmf(write_parmf(cfg)).passes[0].match_fields[1].comparator == "ei"
