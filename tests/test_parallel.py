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


def test_design_blocks_sharded_matches_single(mesh8):
    """The sharded Stage-A block stream (windows over 'win', MSA rows over
    'seq' with all-gap row padding) is bit-identical to
    design_scan.design_stats_blocks — including the patched-window tensor
    and the pad-corrected gap counts."""
    masks, _ = _example(n=37, length=256, seed=3)   # 37 % 4 != 0: pads rows
    positions = np.arange(4, 4 + 70, dtype=np.int32)  # 70 % 32: pads windows
    single = list(design_scan.design_stats_blocks(
        masks, positions, plen=18, variation=1, block=32))
    sharded = list(pmesh.design_stats_blocks_sharded(
        mesh8, masks, positions, plen=18, variation=1, block=32))
    assert len(single) == len(sharded) == 3
    for (pos_a, out_a), (pos_b, out_b) in zip(single, sharded):
        assert np.array_equal(pos_a, pos_b)
        assert sorted(out_a) == sorted(out_b)
        for key in out_a:
            assert np.array_equal(np.asarray(out_a[key]),
                                  np.asarray(out_b[key])), key


def test_pipeline_devices_byte_identical(tmp_path):
    """`mptpu run --devices 8` == `--devices 1`, byte for byte, with the
    device Stage A routed through the mesh (VERDICT r2 item 1's
    done-criterion).  Same results path both times: several reference
    formats embed the output path in column 1."""
    import os
    rng = np.random.default_rng(9)
    lut = np.array(list("ACGT"))
    bases = ["".join(rng.choice(lut, size=500)) for _ in range(2)]
    fa = tmp_path / "two.fa"
    with open(fa, "w") as f:
        for b, base in enumerate(bases):
            for i in range(8):
                s = list(base)
                for _ in range(6):
                    s[rng.integers(0, len(s))] = str(rng.choice(lut))
                f.write(">%c%d\n%s\n" % (65 + b, i, "".join(s)))
    from multiprime_tpu.pipeline.driver import run_pipeline
    res = tmp_path / "res"
    kw = dict(input_fa=str(fa), results_dir=str(res), virus_name="two",
              coverage=0.5, min_seq_length=100, product_size=(100, 400),
              algo="v20", stage_a="device")
    run_pipeline(None, devices=1, **kw)
    one_dir = tmp_path / "res_one"
    os.rename(res, one_dir)
    run_pipeline(None, devices=8, **kw)
    # reports carry a content-derived stamp, so .hairpin/.dimer are
    # byte-checked too (only the metrics json legitimately differs)
    skip = ("pipeline_metrics.json",)
    one_files = sorted(p for p in one_dir.rglob("*") if p.is_file())
    assert one_files
    for p in one_files:
        rel = p.relative_to(one_dir)
        if any(str(rel).endswith(s) for s in skip):
            continue
        assert (res / rel).read_bytes() == p.read_bytes(), str(rel)


def test_find_hits_sharded_matches_single(mesh8):
    """Sparse sharded scan == single-device scan_hits on ragged targets
    (different lengths, planted hits near shard boundaries, degenerate
    primer expansions)."""
    from multiprime_tpu.validate import scan as vscan
    rng = np.random.default_rng(5)
    lut = np.array(list("ACGT"))
    targets = ["".join(rng.choice(lut, size=int(n)))
               for n in rng.integers(60, 300, size=37)]
    primers = ["".join(rng.choice(lut, size=18)) for _ in range(5)]
    # plant hits: exact, 1-mismatch (allowed), mismatch-in-3'-term (vetoed)
    targets[0] = targets[0][:10] + primers[0] + targets[0][28:]
    mut = list(primers[1]); mut[2] = "A" if mut[2] != "A" else "C"
    targets[8] = targets[8][:50] + "".join(mut) + targets[8][68:]
    bad = list(primers[2]); bad[-1] = "A" if bad[-1] != "A" else "C"
    targets[36] = targets[36][:5] + "".join(bad) + targets[36][23:]
    params = vscan.ScanParams(mm=1, term=4, batch_seqs=8,
                              device_batch_seqs=16, backend="numpy",
                              want_mism=True)
    single = vscan.scan_hits(targets, primers, params)
    from multiprime_tpu.parallel import mesh as pmesh
    with pmesh.use_mesh(mesh8):
        sharded = vscan.scan_hits(targets, primers, params)
    assert sharded == single
    assert any(s == 0 for s, *_ in single)      # planted exact hit found
    assert any(s == 8 for s, *_ in single)      # 1-mismatch hit found
    assert not any(s == 36 for s, *_ in single)  # 3'-term veto enforced


def test_validate_run_sharded_byte_identical(mesh8, tmp_path):
    """Full coverage-validation flow under a mesh writes byte-identical
    .out/.pair.num/.total.acc.num (VERDICT r1 item 2 done-criterion)."""
    from multiprime_tpu.validate import scan as vscan
    rng = np.random.default_rng(11)
    lut = np.array(list("ACGT"))
    f_primer = "".join(rng.choice(lut, size=18))
    r_primer = "".join(rng.choice(lut, size=18))
    import multiprime_tpu.utils.iupac as iupac
    targets = []
    for i in range(23):
        body = "".join(rng.choice(lut, size=400))
        if i % 3 == 0:    # plant F...RC(R) product of length ~200
            body = (body[:60] + f_primer + body[78:240]
                    + iupac.rc(r_primer) + body[258:])
        targets.append(body)
    ref_fa = tmp_path / "ref.fa"
    with open(ref_fa, "w") as f:
        for i, t in enumerate(targets):
            f.write(">g%d\n%s\n" % (i, t))
    primer_fa = tmp_path / "primers.fa"
    primer_fa.write_text(">C0_F\n%s\n>C0_R\n%s\n" % (f_primer, r_primer))
    params = vscan.ScanParams(mm=1, term=4, product_size=(100, 400),
                              batch_seqs=8, device_batch_seqs=16,
                              backend="numpy")
    out_single = tmp_path / "single.out"
    vscan.run(str(primer_fa), str(ref_fa), str(out_single), params)
    from multiprime_tpu.parallel import mesh as pmesh
    out_mesh = tmp_path / "mesh.out"
    with pmesh.use_mesh(mesh8):
        vscan.run(str(primer_fa), str(ref_fa), str(out_mesh), params)
    for suffix in ("", ".pair.num", ".total.acc.num"):
        a = (tmp_path / ("single.out" + suffix)).read_bytes()
        b = (tmp_path / ("mesh.out" + suffix)).read_bytes()
        assert a == b, "sharded output differs for %r" % suffix
    body = out_single.read_text().splitlines()
    assert len(body) > 1, "no PCR products found — test not exercising join"


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
