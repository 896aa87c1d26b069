"""Golden parity for the pairing engine (get_multiPrime equivalent).

Chains design (v16) -> pairing and compares against the golden
candidate.primers.txt (all fields except the leading absolute-path ID).
"""

import json
import pathlib

import pytest

from multiprime_tpu.models import mcdpd, pairing
from .conftest import requires_reference
from .test_design_golden import golden_params, GOLD_MSA

GOLD_CAND = pathlib.Path(
    "/root/reference/test_data/results/Clusters_cprimer/"
    "Cluster_0_20727.candidate.primers.txt")
GOLD_FA = pathlib.Path(str(GOLD_CAND) + ".fa")
REF_TFA = pathlib.Path(
    "/root/reference/test_data/results/Clusters_fa/Cluster_0_20727.tfa")


@requires_reference
@pytest.mark.slow
def test_pairing_bit_identical(tmp_path):
    ids, chars = mcdpd.parse_msa(str(GOLD_MSA))
    eng = mcdpd.DesignEngine(golden_params())
    results = eng.design(ids, chars)
    out = tmp_path / "Cluster_0_20727.top.primer.out"
    mcdpd.write_outputs(results, str(out))

    params = pairing.PairingParams(
        size=(150, 1200), fraction=0.7, end_dege=4, hairpin_distance=4,
        diff_tm=5, max_seq=0,
        adaptor=("TCTTTCCCTACACGACGCTCTTCCGATCT",
                 "TGGAGTTCAGACGTGTGCTCTTCCGATCT"))
    primers = pairing.parse_primer_table(str(out))
    gap_ids = json.loads((tmp_path / (out.name + ".gap_seq_id_json")).read_text())
    non_cover = json.loads(
        (tmp_path / (out.name + ".non_coverage_seq_id_json")).read_text())
    number = pairing.count_ref_seqs(str(REF_TFA), 0)
    assert number == 500
    peng = pairing.PairingEngine(params)
    pairs, cand = peng.pair(primers, gap_ids, non_cover, number)
    assert len(cand) == 458
    cand_out = tmp_path / "Cluster_0_20727.candidate.primers.txt"
    pairing.write_outputs(pairs, str(cand_out))

    golden_fields = GOLD_CAND.read_text().split("\t")
    mine_fields = cand_out.read_text().split("\t")
    # field 0 is the absolute output path (machine-dependent in both).
    assert mine_fields[1:] == golden_fields[1:]
    assert (tmp_path / "Cluster_0_20727.candidate.primers.fa").read_text() \
        == GOLD_FA.read_text()


def test_pure_gate_batch_equivalence(monkeypatch):
    """The all-pure batched gate path must produce the identical pair list
    (candidates, f_ok/r_ok, r_seq) as the per-candidate Python/native
    gates, across gate-triggering primers (hairpins, GC extremes, runs,
    clamps) and a degenerate-primer cluster that must fall back."""
    import numpy as np

    from multiprime_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(91)
    lut = np.array(list("ACGT"))
    params = pairing.PairingParams(
        size=(40, 200), fraction=0.5, end_dege=4, hairpin_distance=4,
        diff_tm=30, adaptor=("TCTTTCCCTACACGACGCTCTTCCGATCT",
                             "TGGAGTTCAGACGTGTGCTCTTCCGATCT"), max_seq=0)

    def synth_cluster(n_pos, dege=False):
        primers = {}
        specials = ["ACGTACGTACGTACGTAC", "GGGGGGGGGCCCCCCCCC",
                    "ATATATATATATATATAT", "ACGTAAAACGTACGTACG",
                    "GGCGGCGGAAAATTTTGG"]
        for k in range(n_pos):
            pos = 3 + 7 * k
            if k < len(specials):
                pr = specials[k]
            else:
                pr = "".join(rng.choice(lut, size=18))
            if dege and k == n_pos - 1:
                pr = "R" + pr[1:]
            primers[pos] = [pr, 0.9, 5, 5, float(50 + rng.integers(0, 8))]
        return primers

    for trial, dege in ((0, False), (1, False), (2, True)):
        primers = synth_cluster(40 + trial * 13, dege)
        gap_ids = {str(pos): {} for pos in primers}
        non_cover = {str(pos): [{}, {}] for pos in primers}
        eng = pairing.PairingEngine(params)
        with_batch, cand_b = eng.pair(primers, gap_ids, non_cover, 5)
        used_batch = eng._gate_maps is not None
        assert used_batch == (not dege), trial
        monkeypatch.setattr(native, "pure_gate_batch",
                            lambda *a, **k: None)
        eng2 = pairing.PairingEngine(params)
        plain, cand_p = eng2.pair(primers, gap_ids, non_cover, 5)
        monkeypatch.undo()
        assert cand_b == cand_p, trial
        assert with_batch == plain, trial
        assert plain and len(plain) > 3, "fixture produced no pairs"


def test_weak_hairpin_is_weaker():
    eng = pairing.PairingEngine(pairing.PairingParams(weak_hairpin=True))
    strong = pairing.PairingEngine(pairing.PairingParams(weak_hairpin=False))
    # A primer whose hairpin only appears in a non-first expansion of the
    # 5' kmer: weak scan misses it, strong scan finds it.
    primer = "RCGGGTTTTTTCCCGAT"  # R expands A then G; GCGGG pairs CCCGC
    assert strong.hairpin(primer) or not eng.hairpin(primer)


def test_count_ref_seqs(tmp_path):
    f = tmp_path / "x.fa"
    f.write_text(">a\nACGT\n>b\nACGT\n>c\nACGT\n")
    assert pairing.count_ref_seqs(str(f)) == 3
    assert pairing.count_ref_seqs(str(f), max_seq=2) == 2


def test_dimer_check_factored_matches_direct_scan():
    """The factored per-primer-set dimer verdict must equal the reference's
    direct per-pair scan (_dimer_check_ref) on degenerate fuzz primers."""
    import random

    rng = random.Random(11)
    eng = pairing.PairingEngine(pairing.PairingParams())
    codes = "ACGTRYSWKMBDHVN"

    def mk(bias=None):
        length = rng.choice([16, 18, 20])
        out = []
        deg = 0
        for _ in range(length):
            if deg < 2 and rng.random() < 0.15:
                out.append(rng.choice(codes))
                deg += 1
            elif bias and rng.random() < 0.6:
                out.append(rng.choice(bias))
            else:
                out.append(rng.choice("ACGT"))
        return "".join(out)

    for trial in range(400):
        f = mk("GC" if trial % 3 == 0 else None)
        r = mk()
        assert eng.dimer_check(f, r) == eng._dimer_check_ref(f, r), (f, r)


def test_forked_pair_pass_identical_to_serial():
    """The fork-parallel enumeration (nproc>1, >=2048 candidates) must
    return the exact pair list (content AND order) of the serial pass."""
    import numpy as np
    from multiprime_tpu.models import pairing

    rng = np.random.default_rng(5)
    primers, non_cover, gap_ids = {}, {}, {}
    acgt = np.array(list("ACGT"))
    ids = ["a%d" % i for i in range(12)]
    for pos in range(0, 18000, 3):
        primer = "".join(rng.choice(acgt, size=18))
        tm = float(round(50 + 10 * rng.random(), 2))
        primers[pos] = [primer, 10, 10, tm]
        # a few uncovered ids per side so coverage varies across pairs
        non_cover[pos] = [
            {"x": list(rng.choice(ids, size=rng.integers(0, 3),
                                  replace=False))},
            {"x": list(rng.choice(ids, size=rng.integers(0, 3),
                                  replace=False))}]
        gap_ids[pos] = {}

    def run(nproc):
        eng = pairing.PairingEngine(pairing.PairingParams(
            size=(150, 600), fraction=0.5, end_dege=4, hairpin_distance=4,
            diff_tm=8, max_seq=0, nproc=nproc))
        return eng.pair(primers, gap_ids, non_cover, len(ids))

    serial, cand_s = run(1)
    forked, cand_f = run(3)
    assert len(cand_s) >= 2048, "gate not exercised"
    assert cand_s == cand_f
    assert serial == forked
    assert len(serial) > 1000


def test_native_dimer_hit_ends_matches_python_fuzz():
    """Native substring walk == the pure-Python oracle on random degenerate
    primers (the result is consumed as a set: membership equality)."""
    import numpy as np
    from multiprime_tpu.models import pairing
    from multiprime_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    letters = np.array(list("ACGTRYMKSWHBVDN"))
    w = np.array([12.0] * 4 + [1.0] * 11)
    w /= w.sum()
    for _ in range(120):
        plen = int(rng.integers(5, 26))
        p = "".join(rng.choice(letters, size=plen, p=w))
        a = pairing._dimer_hit_ends.__wrapped__(p)
        b = frozenset(pairing._dimer_hit_ends_py(p))
        assert a == b, p


def test_native_pure_pair_bands_matches_python_loop():
    """The full native banded enumeration (gates + dimer verdict + avg-Tm
    formatting in C) emits the exact row tuples — same order, same bytes —
    as the Python loop on pure no-uncovered-ids clusters (the dominant
    class at the 21k/100k scales)."""
    import numpy as np
    import pytest
    from multiprime_tpu import native
    from multiprime_tpu.models import pairing
    from multiprime_tpu.thermo import exact as thermo
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    lut = np.array(list("ACGT"))
    pp = pairing.PairingParams(
        size=(150, 1200), fraction=0.7, end_dege=4, hairpin_distance=4,
        diff_tm=5, max_seq=0, nproc=1,
        adaptor=("TCTTTCCCTACACGACGCTCTTCCGATCT",
                 "TGGAGTTCAGACGTGTGCTCTTCCGATCT"))
    for trial in range(8):
        seq = "".join(rng.choice(lut, size=int(rng.integers(400, 800))))
        primers = {}
        for pos0 in range(0, len(seq) - 18):
            w = seq[pos0:pos0 + 18]
            primers[pos0] = [w, 1, 1, round(float(thermo.tm(w)), 2)]
        gap_ids = {str(k): {} for k in primers}
        non_cover = {str(k): [{}, {}] for k in primers}
        nat_pairs, _ = pairing.PairingEngine(pp).pair(
            primers, gap_ids, non_cover, 1)
        orig = native.pure_pair_bands
        native.pure_pair_bands = lambda *a, **k: None
        try:
            py_pairs, _ = pairing.PairingEngine(pp).pair(
                primers, gap_ids, non_cover, 1)
        finally:
            native.pure_pair_bands = orig
        assert nat_pairs == py_pairs
        assert nat_pairs, "trial produced no pairs — fuzz has no teeth"


def test_native_round2_str_matches_python_grid():
    """The kernel's avg-Tm string (%.2f + trailing-zero strip) equals
    Python str(round(_stat_mean([a, b]), 2)) across a dense 2-decimal grid
    — the claim py_round2_str's comment makes (seqlib.cpp)."""
    import numpy as np
    import pytest
    from multiprime_tpu import native
    from multiprime_tpu.models import pairing
    from multiprime_tpu.thermo import exact as thermo
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    # windows of one random sequence with CONTROLLED grid Tm values
    # (the kernel formats (a+b)/2 for every surviving pair; diff_tm=100
    # disables the Tm gate so grid extremes still pair)
    lut = np.array(list("ACGT"))
    seq = "".join(rng.choice(lut, size=700))
    primers = {}
    for pos0 in range(0, len(seq) - 18):
        tm_grid = float(np.round(rng.integers(3000, 9900) / 100.0, 2))
        primers[pos0] = [seq[pos0:pos0 + 18], 1, 1, tm_grid]
    pp = pairing.PairingParams(
        size=(150, 1200), fraction=0.7, diff_tm=100, max_seq=0, nproc=1,
        adaptor=("TCTTTCCCTACACGACGCTCTTCCGATCT",
                 "TGGAGTTCAGACGTGTGCTCTTCCGATCT"))
    gap_ids = {str(k): {} for k in primers}
    non_cover = {str(k): [{}, {}] for k in primers}
    pairs, _ = pairing.PairingEngine(pp).pair(primers, gap_ids,
                                              non_cover, 1)
    assert len(pairs) > 2000
    checked = 0
    for row in pairs:
        s0, _, s1 = row[4].partition(":")
        a = primers[int(s0)][3]
        b = primers[int(s1)][3]
        want = str(round(thermo._stat_mean([a, b]), 2))
        got = row[2].split(":")[1]
        assert got == want, (a, b, got, want)
        checked += 1
    assert checked > 2000


def test_gc_clamp_pure_fast_path_matches_general():
    """The pure-primer gc_clamp fast path (one tail walk) must equal the
    per-suffix degenerate-mean formulation on every input class: pure,
    degenerate, and shorter than num+length-1."""
    import random
    from multiprime_tpu.models import pairing
    eng = pairing.PairingEngine(pairing.PairingParams())
    rng = random.Random(5)
    codes = "ACGT" * 8 + "RYMKSWBDHVN"
    def general(primer, num=4, length=13):
        for i in range(num, num + length):
            if eng._gc_mean(primer[-i:]) > 0.6:
                return True
        return False
    checked_pure = 0
    for trial in range(600):
        ln = rng.choice([6, 12, 16, 18, 20, 25])
        pool = "ACGT" if trial % 2 else codes   # half the trials pure
        primer = "".join(rng.choice(pool) for _ in range(ln))
        got, want = eng.gc_clamp(primer), general(primer)
        assert got == want, primer
        if not (set(primer) - pairing._PURE_SET):
            checked_pure += 1
    assert checked_pure >= 100
