"""Mesh-sharded kernels must agree exactly with their unsharded forms
(8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax

from multiprime_tpu.ops import design_scan, mismatch_scan as ms
from multiprime_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.make_mesh(8)


def _example(n=32, length=256, w=32, seed=0):
    rng = np.random.default_rng(seed)
    masks = (1 << rng.integers(0, 4, size=(n, length))).astype(np.int32)
    masks[rng.random((n, length)) < 0.05] = 0
    positions = np.arange(8, 8 + w, dtype=np.int32)
    return masks, positions


def test_design_stats_sharded_matches_single(mesh8):
    masks, positions = _example()
    ref = jax.jit(
        lambda m, p: design_scan.design_stats.__wrapped__(
            m, p, plen=18, variation=1))(masks, positions)
    out = pmesh.design_stats_sharded(mesh8, masks, positions)
    for key in ("freq", "nn", "cover_number", "gap_number", "viterbi"):
        assert np.array_equal(np.asarray(ref[key]), np.asarray(out[key])), key


def test_coverage_counts_sharded_matches_single(mesh8):
    rng = np.random.default_rng(1)
    lut = np.array(list("ACGT"))
    targets = ["".join(rng.choice(lut, size=128)) for _ in range(32)]
    primers = ["".join(rng.choice(lut, size=18)) for _ in range(8)]
    targets[3] = targets[3][:40] + primers[2] + targets[3][58:]
    t1h, lengths = ms.encode_targets(targets)
    p1h = ms.encode_primers(primers)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    hits, covered = pmesh.coverage_counts_sharded(
        mesh8, t1h, lengths, p1h, s1h, mm=1, term=4)
    # unsharded reference
    counts = np.asarray(ms.match_counts_conv(t1h, p1h))
    suffix = np.asarray(ms.match_counts_conv(t1h, s1h))
    ok = ((18 - counts) <= 1) & (suffix >= 4)
    o_idx = np.arange(counts.shape[1])[None, :, None]
    ok &= (o_idx + 18) <= lengths[:, None, None]
    assert np.array_equal(np.asarray(hits), ok.sum(axis=(0, 1)))
    assert int(covered) == int(np.any(ok, axis=(1, 2)).sum())
    assert int(covered) >= 1
