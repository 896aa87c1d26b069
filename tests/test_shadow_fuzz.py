"""Randomized live-shadow fuzz: synthetic MSAs x random knob combinations,
window-for-window byte parity against the reference NN_degenerate engine
(/root/reference/scripts/multiPrime-core.py:651-858).

The fixed-MSA shadow slices in test_shadow_parity.py pin known regressions;
this file explores MSA shapes those slices can't reach — degenerate input
bases, dense leading/trailing gap blocks, near-duplicate rows, short rows —
under parameter combinations drawn per seed."""

import importlib.util
import pathlib
import sys

import numpy as np
import pytest

from multiprime_tpu.models import mcdpd
from .conftest import requires_reference

REF_CORE = "/root/reference/scripts/multiPrime-core.py"

DEGE = list("RYMKSWHVDB")


def _fuzz_msa(seed):
    """Random family MSA with gaps, degenerate bases and ragged ends."""
    rng = np.random.default_rng(seed)
    L = int(rng.integers(220, 420))
    N = int(rng.integers(12, 48))
    backbone = rng.choice(list("ACGT"), size=L)
    recs = []
    for i in range(N):
        s = backbone.copy()
        # SNP columns every ~12 nt, each seq flips with p=0.3
        for pos in range(4, L - 4, int(rng.integers(8, 16))):
            if rng.random() < 0.3:
                s[pos] = "ACGT"[rng.integers(4)]
        # occasional degenerate base in the raw sequence (IUPAC input)
        if rng.random() < 0.4:
            s[int(rng.integers(10, L - 10))] = DEGE[rng.integers(len(DEGE))]
        # ragged leading/trailing gap blocks
        lead, tail = int(rng.integers(0, 14)), int(rng.integers(0, 14))
        s[:lead] = "-"
        s[L - tail:] = "-" if tail else s[L - tail:]
        # sparse internal gaps
        for _ in range(int(rng.integers(0, 4))):
            s[int(rng.integers(20, L - 20))] = "-"
        recs.append((">fz%d" % i, "".join(s)))
    return recs


def _load_ref(msa_path, plen, coverage, dege_number, degeneracy, variation,
              coordinate, min_product, script=REF_CORE):
    spec = importlib.util.spec_from_file_location("shadow_fuzz_core", script)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["shadow_fuzz_core"] = mod
    spec.loader.exec_module(mod)
    eng = mod.NN_degenerate.__new__(mod.NN_degenerate)
    eng.primer_length = plen
    eng.coverage = coverage
    eng.number_of_dege_bases = dege_number
    eng.score_of_dege_bases = degeneracy
    eng.product = min_product
    eng.position = coordinate
    if hasattr(eng, "get_Y"):        # v20/v16; v15 uses an int margin
        eng.Y_strict, eng.Y_strict_R = eng.get_Y()
    eng.variation = variation
    eng.distance = 4
    eng.GC = "0.2,0.7".split(",")
    eng.nproc = 1
    eng.seq_dict, eng.total_sequence_number = eng.parse_seq(str(msa_path))
    eng.position_list = eng.seq_attribute(eng.seq_dict)
    eng.start_position, eng.stop_position, eng.length = eng.position_list
    eng.raw_entropy_threshold = 3.6
    eng.entropy_threshold = eng.entropy_threshold_adjust(eng.length)
    return eng


class _FakeQ(list):
    def put(self, x):
        self.append(x)


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("seed", range(6))
def test_fuzz_shadow_v20(seed, tmp_path):
    rng = np.random.default_rng(1000 + seed)
    plen = int(rng.choice([16, 18, 18, 20]))
    coverage = float(rng.choice([0.5, 0.6, 0.7, 0.8]))
    dege_number = int(rng.choice([2, 4, 6]))
    degeneracy = int(rng.choice([4, 10, 16]))
    variation = int(rng.choice([0, 1, 2]))
    coordinate = str(rng.choice(["2,3,-1", "1,-1", "1,2,-1", "3,-1,-2"]))
    min_product = int(rng.choice([100, 120, 150]))

    recs = _fuzz_msa(seed)
    msa = tmp_path / ("fuzz%d.msa" % seed)
    msa.write_text("".join("%s\n%s\n" % r for r in recs))

    try:
        ref = _load_ref(msa, plen, coverage, dege_number, degeneracy,
                        variation, coordinate, min_product)
    except SystemExit:
        pytest.skip("reference aborts on this span (window < product)")

    ids, chars = mcdpd.parse_msa(str(msa))
    params = mcdpd.DesignParams(
        primer_length=plen, coverage=coverage, dege_number=dege_number,
        degeneracy=degeneracy, variation=variation, entropy_threshold=3.6,
        gc=(0.2, 0.7), min_product=min_product, coordinate=coordinate,
        hairpin_distance=4, algo="v20")
    eng = mcdpd.DesignEngine(params)
    ext = mcdpd.MSAWindows(ids, chars, plen)
    positions = np.arange(ref.start_position,
                          max(ref.start_position + 1,
                              ref.stop_position - plen))
    wins = ext.windows(positions)
    emitted = 0
    for wi, pos in enumerate(positions):
        ref.resQ = _FakeQ()
        ref.get_primers(ref.seq_dict, int(pos))
        ref_res = ref.resQ[0]
        mine = eng._design_window(int(pos), wins[:, wi, :], ids, len(ids),
                                  ref.entropy_threshold)
        if ref_res is None:
            assert mine is None, (seed, pos)
        else:
            assert mine is not None, (seed, pos)
            assert list(map(str, mine.row())) == \
                [str(ref_res[0][0])] + [str(x) for x in ref_res[0][1]], \
                (seed, pos)
            # sidecar payloads (gap ids + F/R non-coverage) must match too:
            # they drive pairing's coverage union downstream
            # (reference resQ: [row, [pos, [F_nc, R_nc]], [pos, gap_ids]])
            assert [dict(mine.f_non_cover), dict(mine.r_non_cover)] == \
                [dict(ref_res[1][1][0]), dict(ref_res[1][1][1])], (seed, pos)
            assert dict(mine.gap_ids) == dict(ref_res[2][1]), (seed, pos)
            emitted += 1
    # the fuzz only means something if real windows were designed
    assert emitted >= 3, (seed, emitted, len(positions))


V15_SCRIPT = "/root/reference/scripts/multiPrime-core_V15.py"
V16_SCRIPT = ("/root/reference/test_data/Y_distance_update/"
              "multiPrime-core_V16.py")


@requires_reference
@pytest.mark.slow
@pytest.mark.parametrize("algo,seed", [
    ("v16", 0), ("v16", 1), ("v16", 2),
    ("v15", 0), ("v15", 1), ("v15", 2),
])
def test_fuzz_shadow_v15_v16(algo, seed, tmp_path):
    """Same fuzz harness for the older engine generations (the golden files
    were built with V16; V15 drives the -original pipeline)."""
    rng = np.random.default_rng(3000 + seed)
    plen = int(rng.choice([16, 18, 20]))
    coverage = float(rng.choice([0.5, 0.6, 0.7, 0.8]))
    dege_number = int(rng.choice([2, 4, 6]))
    degeneracy = int(rng.choice([4, 10, 16]))
    variation = int(rng.choice([0, 1, 2]))
    min_product = int(rng.choice([100, 120, 150]))
    if algo == "v15":
        coordinate = int(rng.choice([3, 4, 9]))
        script = V15_SCRIPT
    else:
        coordinate = str(rng.choice(["2,3,-1", "1,-1", "2,-1"]))
        script = V16_SCRIPT

    recs = _fuzz_msa(seed + 50)
    msa = tmp_path / ("fz_%s_%d.msa" % (algo, seed))
    msa.write_text("".join("%s\n%s\n" % r for r in recs))

    try:
        ref = _load_ref(msa, plen, coverage, dege_number, degeneracy,
                        variation, coordinate, min_product, script=script)
    except SystemExit:
        pytest.skip("reference aborts on this span (window < product)")

    ids, chars = mcdpd.parse_msa(str(msa))
    params = mcdpd.DesignParams(
        primer_length=plen, coverage=coverage, dege_number=dege_number,
        degeneracy=degeneracy, variation=variation, entropy_threshold=3.6,
        gc=(0.2, 0.7), min_product=min_product,
        coordinate=coordinate if algo != "v15" else "2,3,-1",
        position_margin=coordinate if algo == "v15" else 4,
        hairpin_distance=4, algo=algo)
    eng = mcdpd.DesignEngine(params)
    ext = mcdpd.MSAWindows(ids, chars, plen)
    positions = np.arange(ref.start_position,
                          max(ref.start_position + 1,
                              ref.stop_position - plen))
    wins = ext.windows(positions)
    emitted = 0
    for wi, pos in enumerate(positions):
        ref.resQ = _FakeQ()
        ref.get_primers(ref.seq_dict, int(pos))
        ref_res = ref.resQ[0]
        mine = eng._design_window(int(pos), wins[:, wi, :], ids, len(ids),
                                  ref.entropy_threshold)
        if ref_res is None:
            assert mine is None, (algo, seed, pos)
        else:
            assert mine is not None, (algo, seed, pos)
            assert list(map(str, mine.row())) == \
                [str(ref_res[0][0])] + [str(x) for x in ref_res[0][1]], \
                (algo, seed, pos)
            assert [dict(mine.f_non_cover), dict(mine.r_non_cover)] == \
                [dict(ref_res[1][1][0]), dict(ref_res[1][1][1])], \
                (algo, seed, pos)
            assert dict(mine.gap_ids) == dict(ref_res[2][1]), (algo, seed, pos)
            emitted += 1
    assert emitted >= 3, (algo, seed, emitted, len(positions))
