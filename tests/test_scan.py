"""Mismatch-scan kernel and coverage-validation tests (CPU backend)."""

import numpy as np
import pytest

from multiprime_tpu.ops import mismatch_scan as ms
from multiprime_tpu.validate import scan as vscan
from multiprime_tpu.utils import iupac


def brute_hits(seq, pat, mm=1, term=4):
    out = []
    for o in range(len(seq) - len(pat) + 1):
        w = seq[o:o + len(pat)]
        mis = sum(a != b for a, b in zip(w, pat))
        if mis <= mm and all(a == b for a, b in zip(w[-term:], pat[-term:])):
            out.append((o, mis))
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    lut = np.array(list("ACGT"))
    seqs = ["".join(rng.choice(lut, size=rng.integers(80, 200)))
            for _ in range(24)]
    primers = ["".join(rng.choice(lut, size=18)) for _ in range(8)]
    # plant: exact, 1-mismatch mid, 1-mismatch at 3' end (must be vetoed)
    seqs[0] = seqs[0][:10] + primers[0] + seqs[0][28:]
    p1 = list(primers[1]); p1[9] = "A" if p1[9] != "A" else "C"
    seqs[1] = seqs[1][:20] + "".join(p1) + seqs[1][38:]
    p2 = list(primers[2]); p2[17] = "A" if p2[17] != "A" else "C"
    seqs[2] = seqs[2][:30] + "".join(p2) + seqs[2][48:]
    return seqs, primers


def test_find_hits_matches_bruteforce(data):
    seqs, primers = data
    t1h, lens = ms.encode_targets(seqs)
    p1h = ms.encode_primers(primers)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    idx, n_hits, mism = ms.find_hits(t1h, lens, p1h, s1h, mm=1, term=4,
                                     max_hits=4096)
    n_out = t1h.shape[1] - 18 + 1
    s, o, p, m = ms.decode_hits(idx, mism, n_out, len(primers))
    mine = {(int(a), int(b), int(c), int(d)) for a, b, c, d in zip(s, o, p, m)}
    ref = set()
    for si, seq in enumerate(seqs):
        for pi, pat in enumerate(primers):
            for oo, mm_ in brute_hits(seq, pat):
                ref.add((si, oo, pi, mm_))
    assert mine == ref
    # planted exact hit found, 3'-mismatch hit vetoed
    assert (0, 10, 0, 0) in mine
    assert not any(a == 2 and b == 30 and c == 2 for a, b, c, _ in mine)


def test_pcr_join_exhaustive_vs_parity():
    """The reference's join abandons a gene at the first start with an
    empty product window (primer_specificity.py:351-353); exhaustive=True
    keeps scanning.  Construct a gene where pair A's F site has no R in
    window but pair B's complete amplicon lies further downstream: parity
    mode must drop it (bug-for-bug), exhaustive mode must find it."""
    from multiprime_tpu.validate import scan as vscan
    labels = ["A_F", "A_R", "B_F", "B_R"]
    # F hits: A at 100 (no R within [200, 1600]), B at 5000
    f_hits = [(0, 100, 0, 0), (0, 5000, 2, 0)]
    # R hits: B's at 5500 (inside B's window), none for A
    r_hits = [(0, 5500, 3, 0)]
    rows_par = vscan.pcr_join(["g"], f_hits, r_hits, labels, (100, 1500))
    rows_exh = vscan.pcr_join(["g"], f_hits, r_hits, labels, (100, 1500),
                              exhaustive=True)
    assert rows_par == []                      # reference parity
    assert rows_exh == [("g", 5000, 5500, "B_F", "B_R", 501)]
    # termination clause: every stop below every window -> identical empty
    assert vscan.pcr_join(["g"], [(0, 9000, 0, 0)], r_hits, labels,
                          (100, 1500), exhaustive=True) == []


def test_find_hits_bitmap_matches_find_hits(data):
    """The two-phase bitmap scan (any-hit window bitmap + host re-match —
    the r5 semantically-smaller-output experiment, DESIGN.md) returns the
    exact hit tuples of the dense find_hits path, for both the conv
    reduction and the fused Pallas kernel (interpret mode off-TPU)."""
    seqs, primers = data
    t1h, lens = ms.encode_targets(seqs)
    p1h = ms.encode_primers(primers)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    idx, _, mism = ms.find_hits(t1h, lens, p1h, s1h, mm=1, term=4,
                                max_hits=4096)
    n_out = t1h.shape[1] - 18 + 1
    s, o, p, m = ms.decode_hits(idx, mism, n_out, len(primers))
    ref = sorted(zip(s.tolist(), o.tolist(), p.tolist(), m.tolist()))
    s2, o2, p2, m2 = ms.find_hits_bitmap(t1h, lens, p1h, s1h, mm=1,
                                         term=4, backend="conv")
    got = sorted(zip(s2.tolist(), o2.tolist(), p2.tolist(), m2.tolist()))
    assert got == ref and len(ref) > 0
    # pallas kernel parity via interpret mode (no TPU in the test env)
    import jax.numpy as jnp
    bm_conv = np.asarray(ms.hit_window_bitmap(
        jnp.asarray(t1h), jnp.asarray(lens), jnp.asarray(p1h),
        jnp.asarray(s1h), mm=1, term=4, backend="conv"))
    bm_pal = np.asarray(ms.hit_window_bitmap_pallas(
        jnp.asarray(t1h, jnp.int8), jnp.asarray(p1h),
        jnp.asarray(s1h), mm=1, term=4, interpret=True))
    o_idx = np.arange(bm_pal.shape[1])[None, :]
    bm_pal = np.where((o_idx + 18) <= lens[:, None], bm_pal, 0)
    assert np.array_equal(bm_pal, bm_conv)


def test_mask_upload_path_matches_onehot(data):
    """The compact [N, L] mask upload (expanded on device) must produce
    exactly the hits of the host one-hot encoding."""
    seqs, primers = data
    seqs = seqs + ["ACGTNRYSWacgt" * 10]   # ambiguity + lowercase
    t1h, lens = ms.encode_targets(seqs)
    tm, lens2 = ms.encode_target_masks(seqs)
    assert np.array_equal(lens, lens2)
    assert np.array_equal(np.asarray(ms.expand_masks(tm)), t1h)
    p1h = ms.encode_primers(primers)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    a = ms.find_hits(t1h, lens, p1h, s1h, mm=1, term=4, max_hits=4096)
    b = ms.find_hits(tm, lens, p1h, s1h, mm=1, term=4, max_hits=4096)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(a[1]) == int(b[1])


def test_hit_codes_pallas_matches_conv(data):
    """Fused Pallas kernel (interpret mode on CPU) vs conv-derived codes."""
    seqs, primers = data
    t1h, lens = ms.encode_targets(seqs)
    p1h = ms.encode_primers(primers)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    plen = p1h.shape[1]
    codes = np.asarray(ms.hit_codes_pallas(
        t1h, p1h, s1h, mm=1, term=4, interpret=True))
    counts = np.asarray(ms.match_counts_conv(t1h, p1h))
    suffix = np.asarray(ms.match_counts_conv(t1h, s1h))
    mism = plen - counts
    ref = np.where((mism <= 1) & (suffix >= 4), mism + 1, 0).astype(np.int8)
    assert np.array_equal(codes, ref)


def test_ambiguous_target_bases_never_match():
    t1h, lens = ms.encode_targets(["ACGTNNNNACGTACGTACGTACGT"])
    p1h = ms.encode_primers(["ACGTACGT"])
    s1h = p1h.copy()
    s1h[:, :-2, :] = 0
    idx, n, m = ms.find_hits(t1h, lens, p1h, s1h, mm=0, term=2, max_hits=64)
    s, o, p, _ = ms.decode_hits(idx, m, t1h.shape[1] - 7, 1)
    assert 8 in o.tolist() and 4 not in o.tolist()


def test_scan_hits_mixed_lengths():
    seqs = ["ACGTACGTACGTACGTACGTACGT" * 4]
    params = vscan.ScanParams(mm=0, term=2, batch_seqs=4)
    hits = vscan.scan_hits(seqs, ["ACGTACGT", "ACGTACGTACGT"], params)
    pats = {p for _, _, p, _ in hits}
    assert pats == {0, 1}


def test_pcr_join_strict_bounds():
    rows = vscan.pcr_join(
        ["g"],
        [(0, 10, 0, 0)],
        [(0, 110, 1, 0), (0, 210, 1, 0)],
        ["F", "R"], (100, 150))
    # distance 101 passes (strict >100), 201 exceeds the window
    assert rows == [("g", 10, 110, "F", "R", 101)]
    # boundary distance == min is excluded (strict inequality)
    rows2 = vscan.pcr_join(["g"], [(0, 10, 0, 0)], [(0, 109, 1, 0)],
                           ["F", "R"], (100, 150))
    assert rows2 == []


def test_expand_primer_fasta(tmp_path):
    fa = tmp_path / "p.fa"
    fa.write_text(">P1\nACGR\n>P2\nACGA\n")
    seqs, labels = vscan.expand_primer_fasta(str(fa), 0, str(tmp_path / "t.fa"))
    # ACGR expands to ACGA/ACGG; ACGA is shared with P2 -> merged ids
    assert "ACGA" in seqs and "ACGG" in seqs
    merged = labels[seqs.index("ACGA")]
    assert "P1" in merged and "P2" in merged


def test_scan_hits_long_segments_match_unsplit():
    rng = np.random.default_rng(2)
    lut = np.array(list("ACGT"))
    genome = "".join(rng.choice(lut, size=5000))
    prims = ["".join(rng.choice(lut, size=18)) for _ in range(20)]
    # plant hits at a segment boundary, inside the overlap, and at the end
    genome = genome[:582] + prims[0] + genome[600:]
    genome = genome[:1182] + prims[1] + genome[1200:]
    genome = genome[:4982] + prims[2] + genome[5000:]
    targets = [genome, "ACGT" * 30]
    base = dict(term_len=0, term=4, mm=1, backend="numpy")
    nosplit = vscan.ScanParams(seg_len=1 << 20, **base)
    split = vscan.ScanParams(seg_len=600, **base)
    a = sorted(vscan.scan_hits_long(targets, prims, nosplit))
    b = sorted(vscan.scan_hits_long(targets, prims, split))
    assert a == b
    found = {(s, o, p) for s, o, p, _ in a}
    assert {(0, 582, 0), (0, 1182, 1), (0, 4982, 2)} <= found


def test_genome_scale_pcr_join(tmp_path):
    rng = np.random.default_rng(3)
    lut = np.array(list("ACGT"))
    genome = list("".join(rng.choice(lut, size=150_000)))
    f_p = "".join(rng.choice(lut, size=18))
    r_p = "".join(rng.choice(lut, size=18))
    # plant F at 70000 and RC(R) ending the ~500bp product
    genome[70000:70018] = f_p
    genome[70482:70500] = iupac.rc(r_p)
    genome = "".join(genome)
    prim = tmp_path / "p.fa"
    prim.write_text(">gF\n%s\n>gR\n%s\n" % (f_p, r_p))
    ref = tmp_path / "g.fa"
    ref.write_text(">chr1\n" + genome + "\n")
    params = vscan.ScanParams(term_len=0, term=4, mm=1, backend="numpy",
                              product_size=(100, 1500), seg_len=1 << 15)
    rows = vscan.run(str(prim), str(ref), str(tmp_path / "o.out"), params)
    assert any(r[1] == 70000 and r[2] == 70482 and r[5] == 483
               for r in rows)


def test_find_hits_numpy_empty_targets():
    """Zero-row target batches return an empty (0, 4) array, not a crash."""
    import numpy as np

    from multiprime_tpu.ops import mismatch_scan as ms

    p1h = ms.encode_primers(["ACGTACGTACGTACGTAA"])
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    t1h = np.zeros((0, 64, 4), np.uint8)
    out = ms.find_hits_numpy(t1h, np.zeros(0, np.int64), p1h, s1h,
                             mm=1, term=4)
    assert out.shape == (0, 4)


# ---------------------------------------------------------------------------
# native mask scan + degenerate-key fast path
# ---------------------------------------------------------------------------

def _random_degenerate(rng, n, plen, letters="ACGTRYMKSWHBVDN"):
    lut = np.array(list(letters))
    weights = np.array([10.0] * 4 + [1.0] * (len(letters) - 4))
    weights /= weights.sum()
    return ["".join(rng.choice(lut, size=plen, p=weights))
            for _ in range(n)]


def test_native_mask_scan_matches_numpy_fuzz():
    """Native early-exit mask scan == find_hits_numpy on degenerate
    patterns, random targets (incl. Ns), every (mm, term) corner."""
    from multiprime_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    lut = np.array(list("ACGTN"))
    for trial in range(6):
        plen = int(rng.integers(6, 20))
        seqs = ["".join(rng.choice(lut, size=rng.integers(plen, 120),
                                   p=[.24, .24, .24, .24, .04]))
                for _ in range(12)]
        pats = _random_degenerate(rng, 6, plen)
        # plant one pattern expansion for guaranteed hits
        exp = iupac.expand(pats[0])[0]
        seqs[0] = seqs[0][:3] + exp + seqs[0][3 + plen:]
        for mm in (0, 1, 2):
            for term in (0, 2, plen, plen + 1):
                t1h, lens = ms.encode_targets(seqs)
                p1h = ms.encode_primers(pats)
                s1h = p1h.copy()
                if term > 0:
                    s1h[:, :-term, :] = 0
                else:
                    s1h[:] = 0
                ref = [tuple(r) for r in ms.find_hits_numpy(
                    t1h, lens, p1h, s1h, mm=mm, term=term)]
                codes, lens2 = ms.encode_target_codes(seqs)
                got = [tuple(r) for r in native.mask_scan(
                    codes, lens2, ms.encode_pattern_masks(pats), mm, term)]
                assert got == ref, (trial, mm, term)


def test_native_mask_scan_buffer_retry():
    """Hit counts beyond the initial buffer cap are returned in full."""
    from multiprime_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    codes = np.full((40, 3000), 1, np.uint8)          # all 'A'
    lens = np.full(40, 3000, np.int64)
    masks = np.full((3, 8), 1, np.uint8)              # 'AAAAAAAA' x3
    hits = native.mask_scan(codes, lens, masks, 0, 4)
    assert len(hits) == 40 * (3000 - 8 + 1) * 3
    assert hits[0].tolist() == [0, 0, 0, 0]
    # ascending (row, pos, primer) contract
    flat = hits[:, 0] * (3000 * 3) + hits[:, 1] * 3 + hits[:, 2]
    assert bool(np.all(np.diff(flat.astype(np.int64)) > 0))


def test_run_degenerate_keys_match_expansion_path(tmp_path):
    """run()'s degenerate-key mask scan produces byte-identical outputs to
    the per-expansion scan (the round-1 production path)."""
    rng = np.random.default_rng(5)
    lut = np.array(list("ACGT"))
    pats = _random_degenerate(rng, 4, 18, letters="ACGTRYMKSW")
    genomes = []
    for g in range(8):
        genome = list("".join(rng.choice(lut, size=900)))
        f = iupac.expand(pats[2 * (g % 2)])[0]
        r = iupac.expand(pats[2 * (g % 2) + 1])[0]
        genome[100:118] = f
        genome[500:518] = iupac.rc(r)
        # near-miss copies for mismatch hits
        f2 = list(f); f2[4] = "A" if f2[4] != "A" else "C"
        genome[300:318] = f2
        genomes.append("".join(genome))
    prim = tmp_path / "p.fa"
    prim.write_text("".join(">P%d\n%s\n" % (i, p)
                            for i, p in enumerate(pats)))
    ref = tmp_path / "g.fa"
    ref.write_text("".join(">g%d\n%s\n" % (i, s)
                           for i, s in enumerate(genomes)))
    params = vscan.ScanParams(term_len=0, term=4, mm=1, backend="numpy",
                              product_size=(100, 1500))
    out_deg = tmp_path / "deg.out"
    vscan.run(str(prim), str(ref), str(out_deg), params)
    # force the expansion path by stubbing the keys away
    orig = vscan.expand_primer_fasta
    def no_keys(*a, **kw):
        if kw.pop("with_keys", False):
            seqs, labels = orig(*a, **kw)
            return seqs, labels, None, None
        return orig(*a, **kw)
    out_exp = tmp_path / "exp.out"
    vscan.expand_primer_fasta = no_keys
    try:
        vscan.run(str(prim), str(ref), str(out_exp), params)
    finally:
        vscan.expand_primer_fasta = orig
    for suffix in ("", ".pair.num", ".total.acc.num"):
        a = (str(out_deg) + suffix)
        b = (str(out_exp) + suffix)
        assert open(a).read() == open(b).read(), suffix


def test_expand_primer_fasta_shared_expansion_falls_back(tmp_path):
    """A degenerate primer sharing an expansion with another key must
    disable the key fast path (merged labels need the expansion scan)."""
    fa = tmp_path / "p.fa"
    fa.write_text(">P1\nACGR\n>P2\nACGA\n")
    seqs, labels, keys, key_labels = vscan.expand_primer_fasta(
        str(fa), 0, None, with_keys=True)
    assert keys is None and key_labels is None
    fa2 = tmp_path / "q.fa"
    fa2.write_text(">P1\nACGR\n>P2\nTTGA\n")
    seqs, labels, keys, key_labels = vscan.expand_primer_fasta(
        str(fa2), 0, None, with_keys=True)
    assert keys == ["ACGR", "TTGA"]
    assert key_labels == ["P1", "P2"]


def test_native_seed_scan_matches_mask_scan_fuzz():
    """Seed-indexed scan == early-exit mask walk (itself fuzzed against
    find_hits_numpy) across degenerate patterns and every (mm, term)
    corner, including patterns that overflow the chunk-expansion cap."""
    from multiprime_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(21)
    lut = np.array(list("ACGTN"))
    for trial in range(8):
        plen = int(rng.integers(5, 31))
        seqs = ["".join(rng.choice(lut, size=rng.integers(plen, 300),
                                   p=[.24, .24, .24, .24, .04]))
                for _ in range(15)]
        pats = _random_degenerate(rng, 40, plen)
        pats[3] = "N" * plen                      # blows the chunk cap
        exp = iupac.expand(pats[0])[0]
        seqs[0] = seqs[0][:3] + exp + seqs[0][3 + plen:]
        for mm in (0, 1, 2, 3):
            for term in (0, 2, min(4, plen)):
                codes, lens = ms.encode_target_codes(seqs)
                masks = ms.encode_pattern_masks(pats)
                a = native.mask_scan(codes, lens, masks, mm, term).tolist()
                b = native.seed_scan(codes, lens, masks, mm, term).tolist()
                assert a == b, (trial, mm, term)


def test_conv_corpus_cache_single_upload(monkeypatch):
    """With a corpus_cache, the conv path uploads each target batch once:
    the R scan and retries reuse the F scan's device-resident masks, and
    the hits stay identical to fresh per-call encoding."""
    import jax

    import multiprime_tpu.validate.scan as vs

    rng = np.random.default_rng(13)
    lut = np.array(list("ACGT"))
    targets = ["".join(rng.choice(lut, size=200)) for _ in range(20)]
    primers = ["".join(rng.choice(lut, size=18)) for _ in range(4)]
    targets[2] = targets[2][:30] + primers[1] + targets[2][48:]
    params_fresh = vs.ScanParams(mm=1, term=4, backend="conv",
                                 device_batch_seqs=8)
    fresh_f = vs.scan_hits(targets, primers, params_fresh)

    calls = []
    real_put = jax.device_put
    monkeypatch.setattr(jax, "device_put",
                        lambda x, *a, **k: (calls.append(1),
                                            real_put(x, *a, **k))[1])
    params = vs.ScanParams(mm=1, term=4, backend="conv",
                           device_batch_seqs=8, corpus_cache={})
    got_f = vs.scan_hits(targets, primers, params)
    n_after_first = len(calls)
    got_f2 = vs.scan_hits(targets, primers, params)
    assert got_f == fresh_f == got_f2
    assert any(s == 2 for s, *_ in got_f)
    # second scan re-used the device-resident stack: no new uploads
    assert len(calls) == n_after_first
    assert n_after_first == 2              # one stacked (masks, lengths) put
