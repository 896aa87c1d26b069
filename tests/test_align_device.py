"""Device (jax scan) Gotoh aligner vs the NumPy row loop: identical ops.

The device path keeps the pointer tensor in HBM and backtraces on device
(align/device.py); these tests pin bit-identical op strings, including the
affine-gap continuation tie-breaks, padding members, and the bucketed
shapes, on the CPU backend the suite runs under.
"""

import os

import numpy as np
import pytest

from multiprime_tpu.align import centerstar as cs
from multiprime_tpu.align.device import align_ops_batch_device


def _rand_members(rng, c, n, edits):
    members = []
    for _ in range(n):
        b = list(c.copy())
        for _ in range(rng.integers(0, edits)):
            k = int(rng.integers(0, max(len(b), 1)))
            r = rng.integers(0, 3)
            if r == 0 and b:
                b[k % len(b)] = int(rng.integers(0, 4))
            elif r == 1 and len(b) > 5:
                del b[k % len(b)]
            else:
                b.insert(k % (len(b) + 1), int(rng.integers(0, 4)))
        members.append(np.array(b, np.int8))
    return members


def test_device_ops_match_numpy_random():
    rng = np.random.default_rng(11)
    c = rng.integers(0, 4, size=180).astype(np.int8)
    members = _rand_members(rng, c, 40, 50)
    members.append(rng.integers(0, 4, size=1).astype(np.int8))
    members.append(rng.integers(0, 4, size=400).astype(np.int8))
    ref = cs.align_ops_batch(c, members)
    dev = align_ops_batch_device(c, members, member_block=24)
    assert ref == dev


def test_device_ops_gap_heavy():
    rng = np.random.default_rng(3)
    c = rng.integers(0, 4, size=90).astype(np.int8)
    # members with long runs missing / inserted stress the affine states
    members = [
        c[30:],                       # long leading deletion
        np.concatenate([c[:40], c[60:]]),   # internal deletion
        np.concatenate([c[:50], rng.integers(0, 4, 35).astype(np.int8),
                        c[50:]]),     # long insertion
        np.repeat(c, 2)[:150].astype(np.int8),
    ]
    ref = cs.align_ops_batch(c, members)
    dev = align_ops_batch_device(c, members)
    assert ref == dev


def test_center_star_backend_invariance():
    rng = np.random.default_rng(5)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, size=150))
    seqs = []
    for _ in range(9):
        b = list(base)
        for _ in range(int(rng.integers(0, 25))):
            k = int(rng.integers(0, max(len(b), 1)))
            r = rng.integers(0, 3)
            if r == 0:
                b[k % len(b)] = "ACGT"[int(rng.integers(0, 4))]
            elif r == 1 and len(b) > 5:
                del b[k % len(b)]
            else:
                b.insert(k % (len(b) + 1), "ACGT"[int(rng.integers(0, 4))])
        seqs.append("".join(b))
    ids = [str(i) for i in range(len(seqs))]
    _, rows_np = cs.center_star_msa(ids, seqs, backend="numpy")
    _, rows_dev = cs.center_star_msa(ids, seqs, backend="device")
    assert rows_np == rows_dev
    _, rows_nat = cs.center_star_msa(ids, seqs, backend="native")
    assert rows_np == rows_nat


def test_native_gotoh_ops_match_numpy():
    """Threaded C++ Gotoh (gotoh_ops_batch) is op-for-op identical to the
    NumPy batch row loop, including affine tie-breaks and padding."""
    from multiprime_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(17)
    c = rng.integers(0, 5, size=210).astype(np.int8)
    members = _rand_members(rng, c, 30, 60)
    members += [
        np.empty(0, np.int8),                         # empty member
        rng.integers(0, 4, size=1).astype(np.int8),   # single base
        rng.integers(0, 4, size=460).astype(np.int8), # longer than center
        c[80:],                                       # long leading deletion
        np.concatenate([c[:60], rng.integers(0, 4, 55).astype(np.int8),
                        c[60:]]),                     # long insertion
    ]
    ref = cs._ops_to_code_matrix(cs.align_ops_batch(c, members))
    nat = native.gotoh_ops_batch(c, members)
    s = ref.shape[1]
    assert nat.shape[1] >= s
    assert (nat[:, :s] == ref).all()
    assert (nat[:, s:] == 3).all()
    # empty-center edge: everything is an insertion
    nat0 = native.gotoh_ops_batch(np.empty(0, np.int8), members[:3])
    ref0 = cs._ops_to_code_matrix(cs.align_ops_batch(
        np.empty(0, np.int8), members[:3]))
    assert (nat0[:, :ref0.shape[1]] == ref0).all()


def test_refine_device_matches_numpy():
    from multiprime_tpu.align import refine

    rng = np.random.default_rng(13)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, size=160))
    seqs = []
    for _ in range(14):
        b = list(base)
        for _ in range(int(rng.integers(5, 30))):
            k = int(rng.integers(0, max(len(b), 1)))
            r = rng.integers(0, 3)
            if r == 0:
                b[k % len(b)] = "ACGT"[int(rng.integers(0, 4))]
            elif r == 1 and len(b) > 5:
                del b[k % len(b)]
            else:
                b.insert(k % (len(b) + 1), "ACGT"[int(rng.integers(0, 4))])
        seqs.append("".join(b))
    ids = [str(i) for i in range(len(seqs))]
    _, rows = cs.center_star_msa(ids, seqs, backend="numpy")
    a = refine.refine_pass(rows, backend="numpy")
    b = refine.refine_pass(rows, backend="device")
    assert a == b


def test_merge_rows_vec_matches_scalar_oracle():
    """Vectorised center-star merge vs the original per-op walk, on random
    sequences with indels (both backends' op lists feed the same merge)."""
    import random
    from multiprime_tpu.align import centerstar as cs
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(120))
    seqs = []
    for _ in range(15):
        s = list(base)
        for _ in range(rng.randint(0, 12)):
            p = rng.randrange(len(s))
            r = rng.random()
            if r < 0.4:
                s.insert(p, rng.choice("ACGT"))
            elif r < 0.7 and len(s) > 50:
                del s[p]
            else:
                s[p] = rng.choice("ACGT")
        seqs.append("".join(s))
    center = cs.pick_center(seqs)
    codes = [cs._encode(s) for s in seqs]
    member_idx = [m for m in range(len(seqs)) if m != center]
    ops = cs.align_ops_batch(codes[center], [codes[m] for m in member_idx])
    per_member = [None] * len(seqs)
    for m, o in zip(member_idx, ops):
        per_member[m] = o
    scalar = cs._merge_rows_scalar(seqs, center, member_idx, per_member)
    fmat = cs._ops_to_code_matrix(ops)
    vec = cs._merge_rows_vec(seqs, center, member_idx, fmat)
    assert vec == scalar


def test_pairwise_intersections_exact():
    import numpy as np
    from multiprime_tpu.align import centerstar as cs
    rng = np.random.default_rng(3)
    for v_universe, nsets in ((300, 20), (200000, 12)):
        sets = [np.unique(rng.integers(0, v_universe, size=rng.integers(0, 400)))
                for _ in range(nsets)]
        got = cs._pairwise_intersections(sets)
        for i in range(nsets):
            for j in range(nsets):
                want = np.intersect1d(sets[i], sets[j],
                                      assume_unique=True).size
                assert got[i, j] == want, (i, j)


# ---------------------------------------------------------------------------
# progressive (guide-tree) aligner


def _mutated_family(rng, n=24, L=360):
    base = "".join(rng.choice(list("ACGT"), size=L))
    seqs = []
    for i in range(n):
        s = list(base)
        fam = i % 3
        for _ in range(int(L * 0.15)):
            p = rng.integers(len(s))
            s[p] = "ACGT"[rng.integers(4)]
        if fam == 0:
            del s[120:135]
            s[250:250] = list("GGTTAACCGG")
        elif fam == 1:
            del s[300:310]
        else:
            s[60:60] = list("TTTTTAAAAA")
            del s[340:352]
        seqs.append("".join(s))
    return seqs


def test_progressive_roundtrip_and_order():
    from multiprime_tpu.align import progressive
    rng = np.random.default_rng(11)
    seqs = _mutated_family(rng, n=15)
    ids = [">s%d" % i for i in range(len(seqs))]
    out_ids, rows = progressive.progressive_msa(ids, seqs)
    assert out_ids == ids
    assert len({len(r) for r in rows}) == 1
    assert [r.replace("-", "") for r in rows] == seqs


def test_upgma_deterministic_and_complete():
    from multiprime_tpu.align import progressive
    rng = np.random.default_rng(4)
    d = rng.random((9, 9))
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0)
    m1 = progressive.upgma(d)
    m2 = progressive.upgma(d.copy())
    assert m1 == m2
    assert len(m1) == 8
    # every node id consumed exactly once as a child
    children = [x for pair in m1 for x in pair]
    assert len(children) == len(set(children))


def test_progressive_beats_centerstar_on_divergent_families():
    """The guide tree merges within-family first, so family-specific indels
    stay in their own columns; center-star merges everything through one
    center and scatters them."""
    from multiprime_tpu.align import progressive, centerstar, refine
    rng = np.random.default_rng(5)
    seqs = _mutated_family(rng, n=30, L=400)
    ids = [">s%d" % i for i in range(len(seqs))]
    _, prows = progressive.progressive_msa(ids, seqs)
    _, crows = centerstar.center_star_msa(ids, seqs, backend="numpy")
    q_prog = refine.agreement_score(refine.encode_rows(prows))
    q_cs = refine.agreement_score(refine.encode_rows(crows))
    assert q_prog > q_cs
    assert len(prows[0]) <= len(crows[0])


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference tree not available")
def test_progressive_matches_mafft_quality_on_golden_slice():
    """On the first 60 sequences of the golden kobuvirus cluster,
    progressive + refine reaches the MAFFT golden alignment's agreement
    score (restricted to the same sequences)."""
    from multiprime_tpu.align import progressive, refine
    from multiprime_tpu.validate.scan import parse_fasta
    ids, seqs = parse_fasta(
        "/root/reference/test_data/results/Clusters_fa/Cluster_0_20727.tfa")
    mids, mrows = parse_fasta(
        "/root/reference/test_data/results/Clusters_msa/Cluster_0_20727.tmsa")
    take = 60
    sel, sub = ids[:take], seqs[:take]
    midx = {h: i for i, h in enumerate(mids)}
    golden = refine.drop_gap_columns([mrows[midx[h]] for h in sel])
    q_mafft = refine.agreement_score(refine.encode_rows(golden))
    _, rows = progressive.progressive_msa(sel, sub)
    rows = refine.refine_msa(rows, 2)
    q = refine.agreement_score(refine.encode_rows(rows))
    assert q >= 0.999 * q_mafft


def test_profile_align_native_matches_numpy():
    """The native profile-profile DP replicates the NumPy path's float32
    arithmetic operation-for-operation: identical op strings."""
    from multiprime_tpu import native
    from multiprime_tpu.align import progressive
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for _ in range(20):
        la, lb = rng.integers(1, 70, 2)
        fa = rng.random((la, 6)).astype(np.float32)
        fb = rng.random((lb, 6)).astype(np.float32)
        fa /= fa.sum(1, keepdims=True)
        fb /= fb.sum(1, keepdims=True)
        score = (fa @ progressive._S) @ fb.T
        nat = native.profile_align_ops(
            score, float(progressive.GAP_OPEN), float(progressive.GAP_EXT))
        lib, tried = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            py = progressive.profile_align(fa, fb)
        finally:
            native._lib, native._tried = lib, tried
        assert np.array_equal(nat, py)
        counts = np.bincount(nat, minlength=3)
        assert counts[0] + counts[1] == la and counts[0] + counts[2] == lb
