"""Device Stage-A vs host Stage-A parity (VERDICT r1 item 1/2).

The device kernels (ops/design_scan) must reproduce the bit-exact host
Stage A (models/mcdpd.MSAWindows + per-window einsums + _viterbi) exactly:
same patched windows, same freq/NN integers, same Viterbi paths, and —
end-to-end — the same WindowResult rows through the production
DesignEngine.design(stage_a="device") path.
"""

import numpy as np
import pytest

from multiprime_tpu.models import mcdpd
from multiprime_tpu.ops import design_scan
from multiprime_tpu.utils import iupac

from .conftest import requires_reference

GOLDEN_MSA = ("/root/reference/test_data/results/Clusters_msa/"
              "Cluster_0_20727.tmsa")


def _random_msa(n=24, length=160, gap_p=0.12, dege_p=0.05, seed=0):
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", np.uint8)
    dege = np.frombuffer(b"RYMKSWHBVD", np.uint8)
    chars = lut[rng.integers(0, 4, size=(n, length))]
    m = rng.random((n, length)) < dege_p
    chars[m] = dege[rng.integers(0, len(dege), size=int(m.sum()))]
    g = rng.random((n, length)) < gap_p
    chars[g] = ord("-")
    # gap runs at the edges to exercise lead/trail patching
    chars[0, :7] = ord("-")
    chars[1, -9:] = ord("-")
    chars[2, :] = ord("-")          # all-gap row
    ids = [">s%d" % i for i in range(n)]
    return ids, chars


def _host_window_tensors(win_chars, variation):
    """The host Stage-A tensors for ONE window, straight out of the
    _design_window dict-building path (no gates)."""
    plen = win_chars.shape[1]
    gapcnt = (win_chars == ord("-")).sum(axis=1)
    alive = gapcnt <= variation
    cover = {}
    for row_chars in win_chars[alive]:
        row = row_chars.tobytes().decode("ascii")
        for e in iupac.expand(row):
            cover[e] = cover.get(e, 0) + 1
    keys = list(cover.keys())
    if not keys:
        z = np.zeros((4, plen), np.int64)
        return z, np.zeros((plen - 1, 4, 4), np.int64), 0, int((~alive).sum())
    counts = np.fromiter(cover.values(), dtype=np.int64, count=len(keys))
    key_chars = np.frombuffer("".join(keys).encode("ascii"),
                              np.uint8).reshape(len(keys), plen)
    onehot = key_chars[:, :, None] == np.frombuffer(b"ACGT", np.uint8)
    freq = np.einsum("k,klb->bl", counts, onehot.astype(np.int64))
    nn = np.einsum("k,kli,klj->lij", counts,
                   onehot[:, :-1, :].astype(np.int64),
                   onehot[:, 1:, :].astype(np.int64))
    return freq, nn, int(alive.sum()), int((~alive).sum())


@pytest.mark.parametrize("seed", [0, 3])
def test_patch_windows_matches_host(seed):
    ids, chars = _random_msa(seed=seed)
    plen = 18
    positions = np.arange(0, chars.shape[1] - plen, 3)
    host = mcdpd.MSAWindows(ids, chars, plen).windows(positions)
    masks = iupac.bytes_to_masks(chars)
    dev = np.asarray(design_scan.patch_windows(
        masks.astype(np.int32), positions.astype(np.int32), plen))
    host_masks = iupac.bytes_to_masks(host).astype(np.int32)
    assert (dev == host_masks).all(), \
        "patched windows differ at %s" % np.argwhere(dev != host_masks)[:5]


def test_window_stats_matches_host_einsums():
    ids, chars = _random_msa(seed=1, dege_p=0.1)
    plen = 18
    variation = 1
    positions = np.arange(0, chars.shape[1] - plen, 5)
    extractor = mcdpd.MSAWindows(ids, chars, plen)
    wins = extractor.windows(positions)
    masks = iupac.bytes_to_masks(chars)
    stats = design_scan.design_stats_full(
        masks.astype(np.int32), positions.astype(np.int32),
        plen=plen, variation=variation)
    freq_d = np.asarray(stats["freq"])
    nn_d = np.asarray(stats["nn"])
    cn_d = np.asarray(stats["cover_number"])
    gn_d = np.asarray(stats["gap_number"])
    vit_d = np.asarray(stats["viterbi"])
    for wi in range(len(positions)):
        freq_h, nn_h, cn_h, gn_h = _host_window_tensors(
            wins[:, wi, :], variation)
        assert (freq_d[wi].T == freq_h).all(), "freq mismatch at w=%d" % wi
        assert (nn_d[wi] == nn_h).all(), "nn mismatch at w=%d" % wi
        assert cn_d[wi] == cn_h and gn_d[wi] == gn_h
        if freq_h.sum():
            vit_h = mcdpd._viterbi(freq_h, nn_h)
            assert (vit_d[wi] == vit_h).all(), "viterbi differs at w=%d" % wi


@requires_reference
def test_device_stage_a_golden_msa_sample():
    """On the real 500x1951 golden MSA: device Stage-A tensors == host for a
    position sample spanning gap-patched and clean regions."""
    ids, chars = mcdpd.parse_msa(GOLDEN_MSA)
    plen, variation = 18, 1
    positions = np.arange(120, 1900 - plen, 97)
    extractor = mcdpd.MSAWindows(ids, chars, plen)
    wins = extractor.windows(positions)
    masks = iupac.bytes_to_masks(chars)
    stats = design_scan.design_stats_full(
        masks.astype(np.int32), positions.astype(np.int32),
        plen=plen, variation=variation)
    win_d = np.asarray(stats["win"])
    host_masks = iupac.bytes_to_masks(wins)
    assert (win_d == host_masks).all()
    freq_d = np.asarray(stats["freq"])
    nn_d = np.asarray(stats["nn"])
    vit_d = np.asarray(stats["viterbi"])
    for wi in range(len(positions)):
        freq_h, nn_h, _, _ = _host_window_tensors(wins[:, wi, :], variation)
        assert (freq_d[wi].T == freq_h).all()
        assert (nn_d[wi] == nn_h).all()
        if freq_h.sum():
            assert (vit_d[wi] == mcdpd._viterbi(freq_h, nn_h)).all()


def _rows(results):
    return [(r.position, r.primer, r.coverage, r.f_mis, r.r_mis, r.tm,
             str(r.information), r.f_non_cover, r.r_non_cover, r.gap_ids)
            for r in sorted(results, key=lambda x: x.position)]


def test_design_device_end_to_end_synthetic():
    """DesignEngine.design with stage_a=device == stage_a=host on a
    synthetic MSA (all WindowResult fields incl. the JSON id dicts)."""
    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGT", np.uint8)
    base = lut[rng.integers(0, 4, size=260)]
    chars = np.tile(base, (30, 1))
    mut = rng.random(chars.shape) < 0.03          # conserved family
    chars[mut] = lut[rng.integers(0, 4, size=int(mut.sum()))]
    gaps = rng.random(chars.shape) < 0.02
    chars[gaps] = ord("-")
    chars[0, :6] = ord("-")
    chars[1, -5:] = ord("-")
    ids = [">s%d" % i for i in range(30)]
    params = dict(coverage=0.5, min_product=100, coordinate="2,3,-1",
                  algo="v20")
    host = mcdpd.DesignEngine(
        mcdpd.DesignParams(stage_a="host", **params)).design(ids, chars)
    dev = mcdpd.DesignEngine(
        mcdpd.DesignParams(stage_a="device", **params)).design(ids, chars)
    assert _rows(host) == _rows(dev)
    assert len(host) > 0


@requires_reference
@pytest.mark.slow
def test_design_device_golden_byte_identical(tmp_path):
    """The production device path writes a byte-identical .top.primer.out
    on the golden cluster (VERDICT r1 done-criterion (b))."""
    ids, chars = mcdpd.parse_msa(GOLDEN_MSA)
    params = mcdpd.DesignParams(coverage=0.7, min_product=150,
                                coordinate="2,3,-1", algo="v16",
                                stage_a="device")
    results = mcdpd.DesignEngine(params).design(ids, chars)
    out = tmp_path / "dev.top.primer.out"
    mcdpd.write_outputs(results, str(out))
    golden = ("/root/reference/test_data/results/Clusters_primer/"
              "Cluster_0_20727.top.primer.out")
    assert out.read_bytes() == open(golden, "rb").read()
