"""Live shadow-run parity for the multi-DegePrime backend: execute the
reference Perl tools (DEGEPRIME-1.1.0) and get_degePrimer.py on synthetic
alignments and compare with models/wrc.py + pairing.pair_degeprime.

DegePrime.pl's WRC search is UNSEEDED (perl rand), so its stochastic columns
are only comparable when the test alignment's per-window base-union
degeneracy fits within max_deg — then every restart of both implementations
reaches the same full union and all eight columns are deterministic.  The
fixture is built to guarantee that.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from .conftest import requires_reference
from multiprime_tpu.models import wrc

DEGEPRIME = "/root/reference/scripts/DEGEPRIME-1.1.0"
SCRIPTS = "/root/reference/scripts"
HAS_PERL = os.path.exists("/usr/bin/perl")

requires_perl = pytest.mark.skipif(
    not (HAS_PERL and os.path.isdir(DEGEPRIME)),
    reason="perl or reference DEGEPRIME not available")


def run_perl(script, args):
    r = subprocess.run(
        ["perl", os.path.join(DEGEPRIME, script)] + args,
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (script, r.stdout[-1500:], r.stderr[-1500:])
    return r


@pytest.fixture(scope="module")
def msa_case(tmp_path_factory):
    """24-seq x 90-col alignment: conserved GC~0.5 backbone, sparse 2-base
    variable sites (any 18-window union degeneracy <= 8), ragged gap ends,
    one internal-gap sequence, one mostly-gap column, lowercase + U input,
    headers with descriptions."""
    rng = np.random.default_rng(20240818)
    tmp = tmp_path_factory.mktemp("degeprime")
    L = 90
    backbone = "".join(rng.choice(list("ACGT"), size=L))
    # variable sites every ~8 columns, two alternatives each
    var_sites = {i: "ACGT"[rng.integers(4)] for i in range(6, L - 6, 8)}
    rows, ids = [], []
    for i in range(24):
        s = list(backbone)
        for pos, alt in var_sites.items():
            if rng.random() < 0.4 and alt != s[pos]:
                s[pos] = alt
        lead = int(rng.integers(0, 5))
        tail = int(rng.integers(0, 5))
        for j in range(lead):
            s[j] = "-"
        for j in range(L - tail, L):
            s[j] = "-"
        if i == 5:                       # internal gaps
            s[40] = s[41] = "-"
        if i != 3:                       # col 70 nearly all-gap
            s[70] = "-"
        if i == 7:                       # lowercase + U in the raw input
            s = [c.lower() for c in s]
            s = ["u" if c == "t" else c for c in s]
        rows.append("".join(s))
        ids.append("seq%d some description %d" % (i, i))
    fa = tmp / "msa.fa"
    fa.write_text("".join(">%s\n%s\n" % (h, r)
                          for h, r in zip(ids, rows)))
    # unaligned cluster fasta for get_degePrimer's -r
    ref_fa = tmp / "cluster.fa"
    ref_fa.write_text("".join(
        ">%s\n%s\n" % (h.split()[0], r.replace("-", "").upper()
                       .replace("U", "T"))
        for h, r in zip(ids, rows)))
    return {"tmp": tmp, "fa": fa, "ref_fa": ref_fa, "ids": ids,
            "rows": rows}


@requires_reference
@requires_perl
def test_trim_shadow_default(msa_case):
    """Pipeline invocation (multi-DegePrime.py:170): no -min => every
    column kept; output reduces to case/U->T/ID normalisation."""
    out_ref = msa_case["tmp"] / "trim.ref.fa"
    run_perl("TrimAlignment.pl",
             ["-i", str(msa_case["fa"]), "-o", str(out_ref)])
    out_mine = msa_case["tmp"] / "trim.mine.fa"
    wrc.write_trimmed(msa_case["rows"], msa_case["ids"], str(out_mine))
    assert out_mine.read_text() == out_ref.read_text()


@requires_reference
@requires_perl
def test_trim_shadow_min_occupancy(msa_case):
    """-min 0.6 drops the near-all-gap column and the ragged ends =>
    exercises the lowercase removed-region markers."""
    out_ref = msa_case["tmp"] / "trim06.ref.fa"
    run_perl("TrimAlignment.pl",
             ["-i", str(msa_case["fa"]), "-o", str(out_ref), "-min", "0.6"])
    out_mine = msa_case["tmp"] / "trim06.mine.fa"
    wrc.write_trimmed(msa_case["rows"], msa_case["ids"], str(out_mine),
                      min_occupancy=0.6)
    ref_text = out_ref.read_text()
    assert out_mine.read_text() == ref_text
    # the marker case must actually occur for this to test anything
    assert any(c.islower() for c in ref_text)


@pytest.fixture(scope="module")
def degeprime_tables(msa_case):
    """Run the real DegePrime.pl and our design_windows on the SAME
    perl-trimmed alignment."""
    trimmed_fa = msa_case["tmp"] / "trimmed.fa"
    run_perl("TrimAlignment.pl",
             ["-i", str(msa_case["fa"]), "-o", str(trimmed_fa)])
    table_ref = msa_case["tmp"] / "table.ref.tsv"
    run_perl("DegePrime.pl",
             ["-i", str(trimmed_fa), "-l", "18", "-d", "96",
              "-o", str(table_ref)])
    ids, rows = wrc.read_fasta_raw(str(trimmed_fa))
    table = wrc.design_windows(rows, plen=18, max_deg=96, iterations=30,
                               seed=7)
    table_mine = msa_case["tmp"] / "table.mine.tsv"
    wrc.write_design(table, str(table_mine))
    return table_ref, table_mine


@requires_reference
@requires_perl
def test_degeprime_shadow(degeprime_tables):
    ref_lines = open(degeprime_tables[0]).read().splitlines()
    my_lines = open(degeprime_tables[1]).read().splitlines()
    assert my_lines[0] == ref_lines[0]          # header
    assert len(my_lines) == len(ref_lines) > 10
    for ref, mine in zip(ref_lines[1:], my_lines[1:]):
        r, m = ref.split("\t"), mine.split("\t")
        # Pos NumberSpanning UniqueMers | PrimerDeg PrimerSeq
        # NumberMatching FractionMatching are all deterministic here
        # (full unions fit max_deg); Entropy is float-compared because
        # perl sums in hash order
        assert m[:3] == r[:3]
        assert abs(float(m[3]) - float(r[3])) < 1e-9, (r, m)
        assert m[4:] == r[4:], (r, m)


@requires_reference
@requires_perl
def test_wrc_distributional_vs_perl(tmp_path):
    """Distributional validation of the SEEDED WRC draw vs the unseeded
    Perl original on a STOCHASTIC fixture (VERDICT r3 weak #6): window
    base-unions exceed max_deg, so the Weighted Randomised Combination
    actually has to choose — N independent Perl runs (perl auto-seeds
    rand per process) vs N seeds of ours must produce per-window coverage
    (NumberMatching) means that agree within the run-to-run spread, and
    matching PrimerDeg populations."""
    rng = np.random.default_rng(77)
    L, n_seqs = 40, 64
    backbone = "".join(rng.choice(list("ACGT"), size=L))
    rows = []
    # dense 4-alternative variable sites: nearly every window variant is
    # unique (a ~64-mer draw universe) and union degeneracy >> max_deg,
    # so few-iteration WRC runs genuinely vary draw to draw
    var_sites = {i: rng.permutation(list("ACGT"))
                 for i in range(2, L - 2, 2)}
    for i in range(n_seqs):
        s = list(backbone)
        for pos, alts in var_sites.items():
            s[pos] = str(alts[rng.integers(0, 4)])
        rows.append("".join(s))
    fa = tmp_path / "msa.fa"
    fa.write_text("".join(">s%d\n%s\n" % (i, r)
                          for i, r in enumerate(rows)))
    trimmed = tmp_path / "trim.fa"
    run_perl("TrimAlignment.pl", ["-i", str(fa), "-o", str(trimmed)])

    def parse_table(path):
        cov, deg = {}, {}
        for line in open(path).read().splitlines()[1:]:
            f = line.split("\t")
            cov[int(f[0])] = int(f[6])       # NumberMatching
            deg[int(f[0])] = int(f[4])       # PrimerDeg
        return cov, deg

    n_runs = 10
    perl_cov, perl_deg = [], []
    for i in range(n_runs):
        out = tmp_path / ("perl%d.tsv" % i)
        run_perl("DegePrime.pl", ["-i", str(trimmed), "-l", "18",
                                  "-d", "24", "-iter", "3", "-skip", "0",
                                  "-o", str(out)])
        c, d = parse_table(str(out))
        perl_cov.append(c)
        perl_deg.append(d)
    ids, trows = wrc.read_fasta_raw(str(trimmed))
    ours_cov, ours_deg = [], []
    for i in range(n_runs):
        table = wrc.design_windows(trows, plen=18, max_deg=24,
                                   iterations=3, seed=1000 + i,
                                   skip_length=0)
        mine = tmp_path / ("mine%d.tsv" % i)
        wrc.write_design(table, str(mine))
        c, d = parse_table(str(mine))
        ours_cov.append(c)
        ours_deg.append(d)
    positions = sorted(perl_cov[0])
    assert len(positions) >= 15, "fixture produced too few windows"
    assert positions == sorted(ours_cov[0])
    # the fixture must actually be stochastic: Perl runs differ
    assert any(perl_cov[0][p] != perl_cov[1][p] for p in positions) or \
        any(perl_cov[1][p] != perl_cov[2][p] for p in positions)
    z_scores = []
    for p in positions:
        pv = np.array([run[p] for run in perl_cov], float)
        ov = np.array([run[p] for run in ours_cov], float)
        spread = max(pv.std(ddof=1), ov.std(ddof=1), 0.5)
        z_scores.append(abs(ov.mean() - pv.mean())
                        / (spread / np.sqrt(n_runs)))
    z = np.array(z_scores)
    # per-window means agree within the sampling noise: individual z
    # bounded, population mean-|z| near the ~0.8 expected under H0
    assert z.mean() < 2.0, z.mean()
    assert (z < 6.0).all(), (z.max(), positions[int(z.argmax())])
    # total coverage across windows within 5% between engines
    tp = np.mean([sum(run.values()) for run in perl_cov])
    to = np.mean([sum(run.values()) for run in ours_cov])
    assert abs(to - tp) / tp < 0.05, (to, tp)
    # degeneracy budgets: both respect max_deg and use similar budgets
    dp = np.mean([np.mean(list(run.values())) for run in perl_deg])
    do = np.mean([np.mean(list(run.values())) for run in ours_deg])
    assert all(v <= 24 for run in perl_deg + ours_deg
               for v in run.values())
    assert abs(do - dp) / dp < 0.15, (do, dp)


@requires_reference
@requires_perl
def test_get_degeprimer_shadow(msa_case, degeprime_tables):
    """Reference get_degePrimer.py vs pairing.pair_degeprime on the SAME
    real DegePrime.pl table: identical pair rows."""
    from multiprime_tpu.models import pairing
    table_ref = degeprime_tables[0]
    out_ref = msa_case["tmp"] / "cand.ref.txt"
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "get_degePrimer.py"),
         "-i", str(table_ref), "-r", str(msa_case["ref_fa"]),
         "-f", "0.1", "-s", "20,40", "-e", "4", "-d", "4",
         "-a", "TCTTTCCCTACACGACGCTCTTCCGATCT,"
               "TGGAGTTCAGACGTGTGCTCTTCCGATCT",
         "-p", "1", "-o", str(out_ref)],
        cwd=SCRIPTS, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    number = pairing.count_ref_seqs(str(msa_case["ref_fa"]), 500)
    primers = pairing.parse_degeprime_table(str(table_ref), number)
    eng = pairing.PairingEngine(pairing.PairingParams(
        size=(20, 40), fraction=0.1, end_dege=4, hairpin_distance=4,
        adaptor=("TCTTTCCCTACACGACGCTCTTCCGATCT",
                 "TGGAGTTCAGACGTGTGCTCTTCCGATCT")))
    pairs, _ = pairing.pair_degeprime(eng, primers)
    out_mine = msa_case["tmp"] / "cand.mine.txt"
    pairing.write_degeprime_output(pairs, str(out_mine))
    ref_fields = out_ref.read_text().split("\t")[1:]   # drop abspath IDs
    my_fields = out_mine.read_text().split("\t")[1:]
    assert ref_fields[:-1], "shadow produced no pairs — fixture too strict"
    assert my_fields == ref_fields
