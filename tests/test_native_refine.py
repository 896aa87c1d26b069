"""Native-vs-Python parity for the v15/v16 refine loop and the Calc_Tm_v2
kernel (seqlib.cpp refine_v16_loop / tm_batch vs models/mcdpd.py
_coverage_stats / thermo/exact.tm)."""

import random

import numpy as np
import pytest

from multiprime_tpu import native
from multiprime_tpu.models import mcdpd
from multiprime_tpu.thermo import exact
from multiprime_tpu.utils import iupac

from .test_shadow_fuzz import _fuzz_msa

needs_native = pytest.mark.skipif(native.load() is None,
                                  reason="native library unavailable")


@needs_native
def test_native_tm_matches_python_fuzz():
    rng = random.Random(7)
    codes = "ACGT" * 6 + "RYMKSWHBVDN"
    checked = 0
    for t in range(2000):
        L = rng.randrange(14, 26, 2) + (t % 2)
        s = "".join(rng.choice(codes) for _ in range(L))
        expansions = iupac.expand(s)
        if len(expansions) > 256:
            continue
        nat = native.tm_batch(expansions)
        assert nat == [exact.tm(e) for e in expansions], s
        checked += 1
    assert checked > 1000


@needs_native
def test_native_tm_symmetric_branch():
    # elementwise-complement halves take the reference's "symmetric" branch
    # (1x concentration denominator + DS_SYMMETRY)
    for first in ("ATGCAGCT", "GGGGCCAA", "ACGTACGT"):
        comp = first.translate(str.maketrans("ACGT", "TGCA"))
        seq = first + comp
        assert exact.is_symmetric(seq)
        assert native.tm_batch((seq,)) == [exact.tm(seq)]


@needs_native
@pytest.mark.parametrize("algo,seed", [("v16", 0), ("v16", 3), ("v16", 7),
                                       ("v15", 1), ("v15", 5)])
def test_native_refine_matches_python_loop(algo, seed, monkeypatch):
    """Full design run with the native refine vs the same run with the
    native path disabled: identical rows on fuzz MSAs."""
    recs = _fuzz_msa(seed + 500)
    ids = [h.lstrip(">") for h, _ in recs]
    chars = np.frombuffer("".join(s for _, s in recs).encode(),
                          np.uint8).reshape(len(recs), -1).copy()
    params = mcdpd.DesignParams(
        primer_length=18, coverage=0.6, dege_number=4, degeneracy=10,
        variation=1, entropy_threshold=3.6, gc=(0.2, 0.7), min_product=100,
        coordinate="2,3,-1", hairpin_distance=4, algo=algo)

    eng = mcdpd.DesignEngine(params)
    rows_native = [r.row() for r in eng.design(ids, chars)]

    monkeypatch.setattr(native, "refine_v16", lambda *a, **k: None)
    eng2 = mcdpd.DesignEngine(params)
    rows_python = [r.row() for r in eng2.design(ids, chars)]
    assert rows_native == rows_python
    assert len(rows_native) > 5


@needs_native
@pytest.mark.parametrize("seed,variation", [(0, 1), (3, 1), (7, 2),
                                            (11, 0), (5, 1)])
def test_native_v20_loop_matches_python(seed, variation, monkeypatch):
    """Full v20 design run with the native mis-coverage-driven loop vs the
    pure-Python loop: identical rows AND identical F/R non-cover dicts
    (their CPython-set-layout key order included) on fuzz MSAs."""
    recs = _fuzz_msa(seed + 900)
    ids = [h.lstrip(">") for h, _ in recs]
    chars = np.frombuffer("".join(s for _, s in recs).encode(),
                          np.uint8).reshape(len(recs), -1).copy()
    params = mcdpd.DesignParams(
        primer_length=18, coverage=0.6, dege_number=4, degeneracy=10,
        variation=variation, entropy_threshold=3.6, gc=(0.2, 0.7),
        min_product=100, coordinate="2,3,-1", hairpin_distance=4,
        algo="v20")

    eng = mcdpd.DesignEngine(params)
    res_native = eng.design(ids, chars)
    rows_native = [r.row() for r in res_native]

    monkeypatch.setattr(native, "refine_v20", lambda *a, **k: None)
    eng2 = mcdpd.DesignEngine(params)
    res_python = eng2.design(ids, chars)
    rows_python = [r.row() for r in res_python]
    assert rows_native == rows_python
    assert len(rows_native) > 5
    # the JSON sidecar inputs (set-layout-ordered dicts) must match too —
    # serialized, so nested key ORDER is part of the comparison
    import json
    gn, nn = mcdpd.pairing_inputs(res_native)
    gp, np_ = mcdpd.pairing_inputs(res_python)
    assert json.dumps(gn) == json.dumps(gp)
    assert json.dumps(nn) == json.dumps(np_)


@needs_native
def test_native_freq_nn_matches_einsum_fuzz():
    """freq_nn (seqlib.cpp) == the einsum formulation it replaced in
    _design_window, including all-zero one-hot rows for gap bytes."""
    rng = np.random.default_rng(11)
    ascii_pool = np.frombuffer(b"ACGT-", np.uint8)
    for _ in range(200):
        k = int(rng.integers(1, 60))
        plen = int(rng.integers(2, 30))
        # bias towards pure bases, but keep gaps in the mix
        key_chars = ascii_pool[
            rng.choice(5, size=(k, plen), p=[0.24, 0.24, 0.24, 0.24, 0.04])]
        counts = rng.integers(1, 500, size=k).astype(np.int64)
        got = native.freq_nn(key_chars, counts)
        assert got is not None
        freq_n, nn_n = got
        onehot = key_chars[:, :, None] == mcdpd._ASCII_BASES[None, None, :]
        freq_e = np.einsum("k,klb->bl", counts, onehot.astype(np.int64))
        left = onehot[:, :-1, :].astype(np.int64)
        right = onehot[:, 1:, :].astype(np.int64)
        nn_e = np.einsum("k,kli,klj->lij", counts, left, right)
        assert freq_n.dtype == np.int64 and nn_n.dtype == np.int64
        np.testing.assert_array_equal(freq_n, freq_e)
        np.testing.assert_array_equal(nn_n, nn_e)
