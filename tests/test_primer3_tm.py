"""Native oligotm (primer3 calcTm) cross-check tests.

The reference validates Calc_Tm_v2 against the primer3 C library via
CalcTm_primer3.py; the C library is absent from this image, so
thermo/primer3_tm.py re-derives the algorithm from the published
parameters.  These tests (a) pin the NN accumulation to hand-summed
SantaLucia 1998 values, (b) pin each salt-correction branch to its
closed-form formula computed independently in the test body, and (c)
run the cross-validation role itself: our exact Calc_Tm_v2 and the
oligotm implementation must agree closely on the golden primer set.
"""

import math
import os

import pytest

from multiprime_tpu.thermo import exact, primer3_tm
from multiprime_tpu.utils import iupac

REF_SET = ("/root/reference/test_data/results/Primers_set/"
           "final_maxprimers_set.fa")


def test_nn_sums_hand_computed():
    # ATGC: steps AT, TG, GC + terminal A (2.3/4.1) + terminal C (0.1/-2.8)
    dh = 2.3 + 0.1 + (-7.2) + (-8.5) + (-9.8)       # kcal/mol
    ds = 4.1 + (-2.8) + (-20.4) + (-22.7) + (-24.4)  # eu
    mono = 50.0    # dv=0 contributes nothing via 120*sqrt(0)
    ds_corr = ds + 0.368 * 3 * math.log(mono / 1000.0)
    expect = (dh * 1000 / (ds_corr + 1.987 * math.log(50 / 4e9)) - 273.15)
    got = primer3_tm.calc_tm("ATGC", mv_conc=50, dv_conc=0, dntp_conc=0.8,
                             dna_conc=50)
    assert got == pytest.approx(expect, abs=1e-9)


def test_symmetry_is_true_rc_palindrome():
    # oligotm's symmetry() is the *correct* palindrome test; the
    # reference's is elementwise-buggy.  ATGCAT is a true RC-palindrome.
    assert primer3_tm.symmetry("ATGCAT")
    assert not exact.is_symmetric("ATGCAT")
    assert primer3_tm.symmetry("ACGT")
    assert not primer3_tm.symmetry("ACGTT")   # odd length
    assert not primer3_tm.symmetry("AAGCTA")
    # symmetric sequences use Ct/1 and ds += -1.4
    sym = primer3_tm.calc_tm("ATGCAT", dv_conc=0)
    dh = 2.3 * 2 + (-7.2) + (-8.5) + (-9.8) + (-8.5) + (-7.2)
    ds = 4.1 * 2 - 1.4 + (-20.4) + (-22.7) + (-24.4) + (-22.7) + (-20.4)
    ds_corr = ds + 0.368 * 5 * math.log(0.05)
    expect = dh * 1000 / (ds_corr + 1.987 * math.log(50 / 1e9)) - 273.15
    assert sym == pytest.approx(expect, abs=1e-9)


def test_divalent_to_monovalent():
    assert primer3_tm.divalent_to_monovalent(0, 0.8) == 0
    assert primer3_tm.divalent_to_monovalent(1.5, 0.6) == pytest.approx(
        120 * math.sqrt(0.9))
    # dv < dntp clamps to dntp -> zero
    assert primer3_tm.divalent_to_monovalent(0.5, 0.8) == 0


def test_schildkraut_branch():
    t_sl = primer3_tm.calc_tm("ACGTACGTACGTACGTAA", dv_conc=1.5,
                              dntp_conc=0.6)
    t_sk = primer3_tm.calc_tm("ACGTACGTACGTACGTAA", dv_conc=1.5,
                              dntp_conc=0.6,
                              salt_corrections_method="schildkraut")
    assert abs(t_sl - t_sk) < 5       # same physics, different correction
    # higher salt raises Tm under every method
    for method in ("santalucia", "schildkraut", "owczarzy"):
        lo = primer3_tm.calc_tm("ACGTACGTACGTACGTAA", mv_conc=25,
                                dv_conc=0, salt_corrections_method=method)
        hi = primer3_tm.calc_tm("ACGTACGTACGTACGTAA", mv_conc=200,
                                dv_conc=0, salt_corrections_method=method)
        assert hi > lo


def test_owczarzy_monovalent_regime():
    # dv=0 -> free Mg ~ 1e-11 -> ratio << 0.22 -> eq-22 monovalent branch
    seq = "ACGTACGTACGTACGTAA"
    got = primer3_tm.calc_tm(seq, mv_conc=50, dv_conc=0, dntp_conc=0,
                             dna_conc=50, salt_corrections_method="owczarzy")
    dh_cal, ds = exact.delta_h_s(seq)      # same published tables
    ln_na = math.log(0.05)
    fgc = (seq.count("G") + seq.count("C")) / len(seq)
    corr = (4.29 * fgc - 3.95) * 1e-5 * ln_na + 9.40e-6 * ln_na * ln_na
    tm_ns = dh_cal / (ds + 1.987 * math.log(50 / 4e9))
    assert got == pytest.approx(1 / (1 / tm_ns + corr) - 273.15, abs=1e-9)


def test_long_sequence_formula():
    seq = "ACGT" * 20                      # 80 nt > max_nn_length
    got = primer3_tm.calc_tm(seq, mv_conc=50, dv_conc=1.5, dntp_conc=0.6)
    salt = 50 + 120 * math.sqrt(0.9)
    expect = (81.5 + 16.6 * math.log10(salt / 1000.0) + 41.0 * 0.5
              - 600.0 / 80)
    assert got == pytest.approx(expect, abs=1e-9)


def test_degenerate_error_and_expand():
    assert primer3_tm.calc_tm("ACGTN") == primer3_tm.OLIGOTM_ERROR
    assert primer3_tm.calc_tm("A") == primer3_tm.OLIGOTM_ERROR
    vals = [primer3_tm.calc_tm(s) for s in iupac.expand("ACGTACGTACGTACGRTA")]
    mean = primer3_tm.calc_tm_degenerate("ACGTACGTACGTACGRTA")
    assert mean == pytest.approx(sum(vals) / len(vals))


@pytest.mark.skipif(not os.path.exists(REF_SET),
                    reason="reference data not mounted")
def test_cross_validation_vs_calctm_golden_set():
    """The CalcTm_primer3 role: the two independent implementations agree
    on the final multiplex primer set at the pipeline's PCR conditions."""
    primers = []
    with open(REF_SET) as f:
        for line in f:
            if not line.startswith(">") and line.strip():
                primers.append(line.strip())
    assert primers
    checked = 0
    for primer in primers:
        for seq in iupac.expand(primer):
            ours = exact.tm_conditions(seq, mono=50, div=1.5, dntp=0.25,
                                       conc=100)
            p3 = primer3_tm.calc_tm(seq, mv_conc=50, dv_conc=1.5,
                                    dntp_conc=0.25, dna_conc=100,
                                    salt_corrections_method="owczarzy")
            # Identical NN tables; the deviation is EXACTLY the GC/length
            # eq-16 terms the reference's stray-semicolon bug discards
            # (Calc_Tm_v2, multiPrime-core.py:324-326).  Predict it:
            # 1/T_p3 = 1/T_ref + (dropped terms), T in kelvin.
            ln_mg = math.log((1.5 - 0.25) / 1000.0)
            ln_na = math.log(0.05)
            fgc = (seq.count("G") + seq.count("C")) / len(seq)
            d = 1.42e-5 * (1.279 - 4.03e-3 * ln_na - 8.03e-3 * ln_na ** 2)
            g = 8.31e-5 * (0.486 - 0.258 * ln_na + 5.25e-3 * ln_na ** 3)
            dropped = (fgc * (6.26e-5 + d * ln_mg)
                       + (1 / (2.0 * (len(seq) - 1)))
                       * (-4.82e-4 + 5.25e-4 * ln_mg + g * ln_mg ** 2))
            pred = 1 / (1 / (ours + 273.15) + dropped) - 273.15
            # residual = reference rounding + R 1.9872-vs-1.987 + symmetry
            assert abs(pred - p3) < 0.1, (seq, ours, p3, pred)
            assert abs(ours - p3) < 4.5, (seq, ours, p3)
            p3_sl = primer3_tm.calc_tm(seq, mv_conc=50, dv_conc=1.5,
                                       dntp_conc=0.25, dna_conc=100)
            assert abs(ours - p3_sl) < 6, (seq, ours, p3_sl)
            checked += 1
    assert checked >= 20


def test_cli_output_format(tmp_path):
    from multiprime_tpu.cli import tools
    fa = tmp_path / "p.fa"
    fa.write_text(">P1_F\nACGTACGTACGTACGTAA\n>P2_R\nGGTATGGTTTCAGACATC\n")
    out = tmp_path / "tm.xls"
    tools.tm_primer3_main(["-i", str(fa), "-f", "fa", "-o", str(out)])
    rows = out.read_text().splitlines()
    assert len(rows) == 2
    info, seq, tm_s = rows[0].split("\t")
    assert info == ">P1_F" and seq == "ACGTACGTACGTACGTAA"
    assert tm_s == str(primer3_tm.calc_tm(
        "ACGTACGTACGTACGTAA", mv_conc=50, dv_conc=1.5, dntp_conc=0.6,
        dna_conc=150))
    # seq mode writes "<seq>\t<tm>" like the reference's else-branch
    out2 = tmp_path / "tm2.xls"
    tools.tm_primer3_main(["-i", "ACGTACGTACGTACGTAA", "-f", "seq",
                           "-o", str(out2)])
    assert out2.read_text().startswith("ACGTACGTACGTACGTAA\t")
