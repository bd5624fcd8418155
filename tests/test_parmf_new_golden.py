"""Golden end-to-end: the reference's LARGEST real config —
samplefiles/parmf_new.txt, 9 passes, comparators uo/uoi/c/q, nonzero low
cutoffs (13/18/2.13/12/14) — parsed by `parse_parmf` and executed through
`run_match` on synthetic fixed-width data laid out at the config's own
field positions, asserted pair-for-pair against an independent Python
oracle implementing the same published Fellegi-Sunter semantics.

Faithfulness note (asserted, not patched around): parmf_new.txt declares
`birth_year 109 4 109 8` — the mem-side slice is the WHOLE 8-char
birthdate while the rec side is the 4-char year, so any pass that blocks
on birth_year can only fire when the mem birthdate is year-only, and then
the month/day match fields are blank.  Combined with the low cutoffs
(pass 5 lo=13, pass 6 lo=18, pass 8 lo=12, pass 9 lo=14) this makes
passes 2, 3, 5, 6, 8, 9 (ids 1, 2, 4, 5, 7, 8) structurally unable to
emit pairs for position-consistent data; the engine and the oracle must
agree on exactly that, which is what "run the reference's config as
written" means.  Live passes: 1 (id 0: fname/lname/birthdate block),
4 (id 3: month+day block, year-q + sex scoring at the w==floor edge),
7 (id 6: phonetic xl/xf block, JW partial-agreement scoring vs lo=2.13).
"""

from __future__ import annotations

import math
from collections import Counter
from pathlib import Path

import pytest

from bigmatch_utilities_spark.config import DictField, parse_parmf
from bigmatch_utilities_spark.operators.pipeline import normalize, run_match
from bigmatch_utilities_spark.operators.scoring import PARTIAL_FLOOR
from bigmatch_utilities_spark.sources.fixed_width import read_fixed_width
from tests.test_comparators import scalar_jaro_winkler

PARMF = "/root/reference/samplefiles/parmf_new.txt"
N_PEOPLE = 48
RECLEN = 880

# physical layout written into the fixed-width lines, matching the
# positions parmf_new.txt declares (rec side / mem side; altlname is the
# one side-divergent field: rec 16 w15, mem 60 w15)
REC_POS = {"chcps": (1, 8), "fname": (9, 12), "altlname": (16, 5), "altfanme": (21, 12),
           "lname": (45, 15), "xl": (93, 4), "xf": (97, 4), "birthdate": (109, 8), "sex": (117, 1)}
MEM_POS = {"chcps": (1, 8), "fname": (9, 12), "altfanme": (21, 12), "lname": (45, 15),
           "altlname": (60, 15), "xl": (93, 4), "xf": (97, 4), "birthdate": (109, 8), "sex": (117, 1)}

FNAME_STEMS = ["MICHAEL", "SARAH", "DAVID", "LAURA", "JAMES", "KAREN", "ROBERT", "EMILY"]
LNAME_STEMS = ["JOHNSON", "WILLIAMS", "MARTINEZ", "BROWN", "ANDERSON", "TAYLOR", "THOMAS", "MOORE"]


def _line(pos: dict[str, tuple[int, int]], vals: dict[str, str]) -> str:
    buf = [" "] * RECLEN
    for name, (start, width) in pos.items():
        v = vals.get(name, "")[:width]
        buf[start - 1 : start - 1 + len(v)] = list(v)
    return "".join(buf)


def _typo(s: str) -> str:
    return s[0] + s[2] + s[1] + s[3:]  # swap chars 2/3: same prefix-1, high JW


def _people():
    """(rec_vals, mem_vals or None) per person; variant = i % 6."""
    out = []
    for i in range(N_PEOPLE):
        # ≤7 chars: the rec-side altlname slice (16 w15) overlaps fname
        # (9 w12) from position 16 on, so an 8+-char fname would leak its
        # suffix into altlname (the reference dict genuinely overlaps)
        fname = f"{FNAME_STEMS[i % 8][:5]}{i:02d}"
        lname = f"{LNAME_STEMS[(i // 8) % 8]}{i:02d}"
        base = {
            "fname": fname, "lname": lname,
            "xl": f"L{i:03d}", "xf": f"F{i:03d}",
            "birthdate": f"{1930 + i}{1 + i % 12:02d}{1 + i % 28:02d}",
            "sex": "MF"[i % 2],
        }
        rec = dict(base, chcps=f"{1000 + i}")
        mem = dict(base, chcps=f"{2000 + i}")
        v = i % 6
        if v == 1:  # strong pair, alt first name agrees on both sides
            rec["altfanme"] = mem["altfanme"] = f"AL{i:02d}"
        elif v == 2:  # sex flipped: every candidate falls below its floor
            mem["sex"] = "FM"[i % 2]
        elif v == 3:  # year off by one, same month+day: pass 4 (q + c), w == 0.0 floor
            mem["birthdate"] = f"{1931 + i}{base['birthdate'][4:]}"
        elif v == 4:  # fname typo, same phonetic codes: pass 7, JW partial
            mem["fname"] = _typo(fname)
        elif v == 5:  # fname unrelated, same codes: JW < 0.75 -> below lo=2.13
            mem["fname"] = f"ZQWVX{i:02d}"
        out.append((rec, mem))
    return out


# -- independent scalar oracle ------------------------------------------------


def _sim(comparator: str, a: str, b: str) -> float:
    if comparator == "c":
        return 1.0 if a == b else 0.0
    if comparator == "uo":
        return scalar_jaro_winkler(a, b)
    if comparator == "uoi":
        return scalar_jaro_winkler(a.lower(), b.lower())
    if comparator == "q":
        try:
            return 1.0 if float(a) == float(b) else 0.0
        except ValueError:
            return 0.0
    raise AssertionError(f"parmf_new.txt only uses uo/uoi/c/q, got {comparator}")


def _weight(match_fields, rrow, mrow) -> float:
    w = 0.0
    for mf in match_fields:
        a, b = rrow[mf.name].strip(), mrow[mf.name].strip()
        if not a or not b:
            continue
        s = _sim(mf.comparator, a, b)
        agr = math.log2(mf.m / mf.u)
        dis = math.log2((1 - mf.m) / (1 - mf.u))
        if s >= 1.0:
            w += agr
        elif s >= PARTIAL_FLOOR:
            w += dis + (agr - dis) * (s - PARTIAL_FLOOR) / (1 - PARTIAL_FLOOR)
        else:
            w += dis
    return w


def _oracle(cfg, rec_rows, mem_rows):
    best: dict[tuple[str, str], tuple[int, float, bool]] = {}
    for k, spec in enumerate(cfg.passes):
        for rrow in rec_rows:
            for mrow in mem_rows:
                ok = True
                for bf in spec.block_fields:
                    a, b = rrow[bf.name].strip(), mrow[bf.name].strip()
                    if (bf.blank_flag and (not a or not b)) or a != b:
                        ok = False
                        break
                if not ok:
                    continue
                w = _weight(spec.match_fields, rrow, mrow)
                if w < min(spec.cutoff.lo, spec.print_cutoff.lo):
                    continue
                key = (rrow["chcps"], mrow["chcps"])
                if key not in best:
                    exact = all(
                        rrow[mf.name] == mrow[mf.name] for mf in spec.match_fields
                    )
                    best[key] = (k, w, exact)
    return best


@pytest.fixture(scope="module")
def golden(spark, tmp_path_factory):
    cfg = parse_parmf(Path(PARMF).read_text())
    root = tmp_path_factory.mktemp("parmf_new")
    people = _people()
    (root / "rec.txt").write_text(
        "\n".join(_line(REC_POS, r) for r, _ in people) + "\n"
    )
    (root / "mem.txt").write_text(
        "\n".join(_line(MEM_POS, m) for _, m in people) + "\n"
    )

    def fields(side: str) -> list[DictField]:
        seen: dict[str, DictField] = {}
        refs = [cfg.id_field] + [
            f for p in cfg.passes for f in (*p.block_fields, *p.match_fields)
        ]
        for f in refs:
            start = f.rec_start if side == "rec" else f.mem_start
            width = f.rec_width if side == "rec" else f.mem_width
            seen.setdefault(f.name, DictField(f.name, start, width))
        return list(seen.values())

    rec = normalize(read_fixed_width(spark, str(root / "rec.txt"), fields("rec")))
    mem = normalize(read_fixed_width(spark, str(root / "mem.txt"), fields("mem")))
    result = run_match(rec, mem, cfg, id_col="chcps")
    oracle = _oracle(
        cfg, [r.asDict() for r in rec.collect()], [m.asDict() for m in mem.collect()]
    )
    return cfg, result, oracle


def test_parse_pins_the_real_config(golden):
    cfg, _, _ = golden
    assert len(cfg.passes) == 9
    assert not cfg.dedupe_single_file
    assert cfg.rec_record_length == cfg.mem_record_length == 880
    assert cfg.id_field.name == "chcps"
    assert [len(p.block_fields) for p in cfg.passes] == [3, 4, 4, 4, 3, 2, 4, 4, 4]
    assert [len(p.match_fields) for p in cfg.passes] == [3, 2, 2, 2, 3, 4, 4, 4, 4]
    assert [p.cutoff.lo for p in cfg.passes] == [0.0, 0.0, 0.0, 0.0, 13.0, 18.0, 2.13, 12.0, 14.0]
    assert all(p.cutoff.hi == 100.0 for p in cfg.passes)
    used = {mf.comparator for p in cfg.passes for mf in p.match_fields}
    assert used == {"uo", "uoi", "c", "q"}
    # the side-divergent widths this file is famous for
    by = {mf.name: mf for mf in cfg.passes[4].match_fields}
    assert (by["birth_mo"].rec_width, by["birth_mo"].mem_width) == (2, 2)
    year = next(bf for bf in cfg.passes[4].block_fields if bf.name == "birth_year")
    assert (year.rec_width, year.mem_width) == (4, 8)


def test_pairs_match_oracle(golden):
    _, result, oracle = golden
    got = {
        (r["id_rec"], r["id_mem"]): (r["pass_id"], r["weight"], r["is_exact"])
        for r in result.pairs.collect()
    }
    assert set(got) == set(oracle)
    for key, (k, w, exact) in oracle.items():
        gk, gw, gx = got[key]
        assert gk == k, (key, gk, k)
        assert gw == pytest.approx(w, abs=1e-9), (key, gw, w)
        assert gx == exact, (key, gx, exact)


def test_per_pass_counts(golden):
    _, result, oracle = golden
    got = Counter(r["pass_id"] for r in result.pairs.collect())
    want = Counter(k for k, _, _ in oracle.values())
    assert got == want
    # engineered live/dead split (see module docstring): 16 exact-block
    # pairs (variants 0+1), 8 month+day-block pairs at w==0.0 (variant 3),
    # 8 phonetic-block JW-partial pairs (variant 4); variants 2 and 5 fall
    # below their pass floors and the width-quirk passes stay empty.
    assert got == Counter({0: 16, 3: 8, 6: 8})


def test_first_pass_wins_and_no_duplicates(golden):
    _, result, _ = golden
    rows = result.pairs.collect()
    keys = [(r["id_rec"], r["id_mem"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_floor_edge_and_decisions(golden):
    cfg, result, _ = golden
    rows = {(r["id_rec"], r["id_mem"]): r for r in result.pairs.collect()}
    # variant 3 (i=3): pass 4 emits exactly AT the floor — year-q
    # disagreement (-log2(99)) + sex agreement (+log2(99)) == 0.0 >= lo 0.0
    r = rows[("1003", "2003")]
    assert r["pass_id"] == 3 and r["weight"] == pytest.approx(0.0, abs=1e-12)
    assert r["decision"] == "possible"  # 0.0 >= lo, < hi=100
    # variant 0 (i=0): all-blank altnames + equal sex -> exact
    r = rows[("1000", "2000")]
    assert r["pass_id"] == 0 and r["is_exact"]
    # variant 1 (i=1): altfanme agrees both sides, but the rec-side
    # altlname slice (16 w15) overlaps altfanme (21 w12) and echoes it,
    # while mem altlname (60 w15) is blank -> not exact, weight still > 0
    r = rows[("1001", "2001")]
    assert r["pass_id"] == 0 and not r["is_exact"] and r["weight"] > 0
    # variant 2 (i=2): sex flip drags every candidate below its floor
    assert ("1002", "2002") not in rows
    # variant 4 (i=4): typo'd fname, JW partial in [0.75, 1), pass 7
    sim = scalar_jaro_winkler("JAMES04", _typo("JAMES04"))
    assert PARTIAL_FLOOR <= sim < 1.0
    r = rows[("1004", "2004")]
    assert r["pass_id"] == 6 and r["weight"] >= 2.13
    # variant 5 (i=5): unrelated fname scores below pass 7's lo=2.13
    assert scalar_jaro_winkler("KAREN05", "ZQWVX05") < PARTIAL_FLOOR
    assert ("1005", "2005") not in rows


def test_width_quirk_passes_are_empty(golden):
    """Passes blocking on birth_year (rec w4 vs mem w8) or cut off above
    their reachable max emit nothing — on BOTH engines."""
    _, result, oracle = golden
    live = {k for k, _, _ in oracle.values()}
    assert live == {0, 3, 6}
    assert {r["pass_id"] for r in result.pairs.collect()} == {0, 3, 6}
