"""Live shadow-run parity for the tool-level components: execute the
reference scripts (subprocess, /root/reference/scripts) on synthetic inputs
and byte-compare their outputs with ours.

Complements the golden-file tests: goldens pin the shipped example, shadow
runs pin behaviour on fresh inputs (degeneracies, dotted IDs, edge shapes).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from .conftest import requires_reference

SCRIPTS = "/root/reference/scripts"


def run_ref(script, args, cwd=None):
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script)] + args,
        cwd=cwd or SCRIPTS, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (script, r.stdout[-2000:], r.stderr[-2000:])
    return r


def _random_seqs(rng, n, lo, hi):
    lut = np.array(list("ACGT"))
    return ["".join(rng.choice(lut, size=rng.integers(lo, hi)))
            for _ in range(n)]


@pytest.fixture(scope="module")
def pcr_case(tmp_path_factory):
    """Targets with planted products for two degenerate pairs; one pair key
    carries a dot (exercises the reference's Path.with_suffix quirk)."""
    rng = np.random.default_rng(11)
    tmp = tmp_path_factory.mktemp("pcr")
    f1, r1 = "GGTAYGGYYTCAGRCATC", "CRACRTATTTCTCDAGGT"
    f2, r2 = "ACGTACGTACGTACGTAA", "TTGGCCAATTGGCCAATT"
    from multiprime_tpu.utils import iupac
    seqs = _random_seqs(rng, 12, 400, 700)
    for i in range(0, 8):
        fe = iupac.expand(f1)[i % 4]
        re_ = iupac.expand(r1)[(i * 3) % 8]
        s = seqs[i]
        seqs[i] = s[:50] + fe + s[68:250] + iupac.rc(re_) + s[268:]
    for i in range(6, 10):   # overlap: some targets match both pairs
        s = seqs[i]
        seqs[i] = s[:300] + f2 + s[318:380] + iupac.rc(r2) + s[398:]
    ref = tmp / "targets.fa"
    ref.write_text("".join(">seq%d\n%s\n" % (i, s)
                           for i, s in enumerate(seqs)))
    prim = tmp / "primers.fa"
    prim.write_text(
        ">Cluster_7.fa_50_F\n%s\n>Cluster_7.fa_268_R\n%s\n"
        ">Cluster_9_300_F\n%s\n>Cluster_9_398_R\n%s\n"
        % (f1, r1, f2, r2))
    return tmp, ref, prim


@requires_reference
def test_shadow_extract_pcr_product_fa(pcr_case):
    tmp, ref, prim = pcr_case
    from multiprime_tpu.validate import pcr
    ref_out = tmp / "ref_out"
    ref_cov = tmp / "ref_cov.xls"
    run_ref("extract_PCR_product.py",
            ["-r", str(ref), "-i", str(prim), "-f", "fa",
             "-o", str(ref_out), "-p", "1", "-s", str(ref_cov)])
    my_out = tmp / "my_out"
    my_cov = tmp / "my_cov.xls"
    pairs = pcr.parse_pairs_fa(str(prim))
    pcr.run(pairs, str(ref), str(my_out), str(my_cov))
    assert ref_cov.read_bytes() == my_cov.read_bytes()
    ref_files = sorted(os.listdir(ref_out))
    assert ref_files == sorted(os.listdir(my_out))
    assert len(ref_files) == 4   # 2 pairs x product/non-product
    for name in ref_files:
        assert (ref_out / name).read_bytes() == (my_out / name).read_bytes()


@requires_reference
def test_shadow_extract_pcr_product_seq(pcr_case):
    tmp, ref, _ = pcr_case
    from multiprime_tpu.validate import pcr
    ref_out = tmp / "ref_out_seq"
    ref_cov = tmp / "ref_cov_seq.xls"
    run_ref("extract_PCR_product.py",
            ["-r", str(ref), "-i", "GGTAYGGYYTCAGRCATC,CRACRTATTTCTCDAGGT",
             "-f", "seq", "-o", str(ref_out), "-p", "1", "-s", str(ref_cov)])
    my_out = tmp / "my_out_seq"
    my_cov = tmp / "my_cov_seq.xls"
    pcr.run({"PCR_info": ("GGTAYGGYYTCAGRCATC", "CRACRTATTTCTCDAGGT")},
            str(ref), str(my_out), str(my_cov))
    assert ref_cov.read_bytes() == my_cov.read_bytes()
    for name in sorted(os.listdir(ref_out)):
        assert (ref_out / name).read_bytes() == (my_out / name).read_bytes()


@requires_reference
def test_shadow_dege_expand(tmp_path):
    from multiprime_tpu.cli import tools
    fa = tmp_path / "in.fa"
    fa.write_text(">P1\nGGTAYGGYYTCAGRCATC\n>P2\nACGT\n>P3\nNNAC\n"
                  ">P4.v2\nAWSMK\n")
    ref_out = tmp_path / "ref.fa"
    run_ref("dege_expand.py", ["-i", str(fa), "-o", str(ref_out)])
    my_out = tmp_path / "my.fa"
    tools.expand_main(["-i", str(fa), "-o", str(my_out)])
    assert ref_out.read_bytes() == my_out.read_bytes()


@requires_reference
def test_shadow_kmer_filter(tmp_path):
    from multiprime_tpu.cli import tools
    rng = np.random.default_rng(5)
    kmers = _random_seqs(rng, 120, 18, 19)
    # planted rejects: di-nucleotide runs, GC clamp, GC out of range,
    # and degenerate survivors
    kmers += ["ACACACACACGTACGTAA", "AAAATTTTACGTACGTAC",
              "ACGTACGTACGTAGCGCC", "GGGGGGGGGGGGGGGGGG", "ATATATATATATATATAT",
              "GGTAYGGYYTCAGRCATC", "CRACRTATTTCTCDAGGT", "AAAAAAAAAAAAAAAAAA"]
    fa = tmp_path / "k.fa"
    fa.write_text("".join(">k%d\n%s\n" % (i, s) for i, s in enumerate(kmers)))
    ref_out = tmp_path / "ref.fa"
    run_ref("kmer_filter.py", ["-i", str(fa), "-g", "0.2,0.7",
                               "-o", str(ref_out)])
    my_out = tmp_path / "my.fa"
    tools.kmer_filter_main(["-i", str(fa), "-g", "0.2,0.7",
                            "-o", str(my_out)])
    assert ref_out.read_bytes() == my_out.read_bytes()
    assert ref_out.read_text().count(">") > 10   # non-trivial survivors


@requires_reference
def test_shadow_calctm(tmp_path):
    from multiprime_tpu.cli import tools
    rng = np.random.default_rng(9)
    primers = _random_seqs(rng, 40, 16, 26)
    fa = tmp_path / "p.fa"
    fa.write_text("".join(">p%d\n%s\n" % (i, s)
                          for i, s in enumerate(primers)))
    ref_out = tmp_path / "ref.xls"
    run_ref("CalcTm.py", ["-i", str(fa), "-f", "fa", "-o", str(ref_out),
                          "-p", "100", "-m", "50", "-d", "1.5", "-n", "0.25"])
    my_out = tmp_path / "my.xls"
    tools.tm_main(["-i", str(fa), "-f", "fa", "-o", str(my_out),
                   "-c", "100", "-m", "50", "-d", "1.5", "-n", "0.25"])
    assert ref_out.read_bytes() == my_out.read_bytes()


def _ont_case(tmp_path, sub):
    """Primer fasta + plain fq reads with distinct pair counts (plain-text
    reads keep their newline in the tail k-mer — a reference quirk)."""
    from multiprime_tpu.utils import iupac
    rng = np.random.default_rng(21)
    d = tmp_path / sub
    d.mkdir()
    pa, pb = "GGTAYGGYYTCAGACATC", "ACGTTGCCAATTGGCTGA"
    prim = d / "primers.fa"
    prim.write_text(">PA\n%s\n>PB\n%s\n" % (pa, pb))
    pa0 = iupac.expand(pa)[0]
    mid = lambda n: "".join(rng.choice(np.array(list("ACGT")), size=n))
    reads = [pa0 + mid(60) + iupac.rc(pb)] * 4 \
        + [pa0 + mid(40) + iupac.rc(pa0)] * 2 \
        + [mid(90)]
    fq = d / "reads.fq"
    fq.write_text("".join("@r%d\n%s\n+\nIIII\n" % (i, s)
                          for i, s in enumerate(reads)))
    return d, prim, fq


@requires_reference
@pytest.mark.parametrize("script,variant", [
    ("FindONTprimerV3.py", False), ("FindONTexpandprimer.py", True)])
def test_shadow_find_ont_primer(tmp_path, script, variant):
    from multiprime_tpu.validate import ont
    rd, rprim, rfq = _ont_case(tmp_path, "ref")
    run_ref(script, ["-i", str(rfq), "-s", str(rprim), "-p", "1",
                     "-l", "18", "-m", "0.6", "-f", "fq",
                     "-o", str(rd / "out")])
    md, mprim, mfq = _ont_case(tmp_path, "mine")
    ont.run(str(mfq), str(mprim), str(md / "out"), primer_len=18,
            min_ident=0.6, fmt="fq", report_variant=variant)
    assert (rd / "out.num").read_bytes() == (md / "out.num").read_bytes()
    # the expand fasta written next to the primer file must also match
    assert (rd / "primers.expand.fa").read_bytes() \
        == (md / "primers.expand.fa").read_bytes()


def _candidate_rows(rng, n_clusters=6, poison_all_last=False):
    """Synthetic candidate_primers_sets.txt rows: per cluster 2-5 pairs;
    some primers share reverse-complemented 3' ends to provoke dimer
    rejections (and in maximum mode, backtracking)."""
    from multiprime_tpu.utils import iupac
    lut = np.array(list("ACGT"))
    mk = lambda: "".join(rng.choice(lut, size=18))
    rows = []
    # cluster 0's pair uses the {A,C} alphabet only: every 3'-end's reverse
    # complement is {G,T}-only, so the pair can never self-dimer and is
    # guaranteed to be accepted — its F is the poison the planted dimers
    # point at.
    ac = np.array(list("AC"))
    poison = "".join(rng.choice(ac, size=18))
    poison_r = "".join(rng.choice(ac, size=18))
    for c in range(n_clusters):
        # cluster 0 shortest so the count-ascending sort processes it (and
        # accepts its poison primer) before any poisoned cluster
        n_pairs = 2 if c == 0 else \
            5 if c == n_clusters - 1 else int(rng.integers(3, 5))
        fields = ["Cluster_%d_%d.txt" % (c, 100 + c)]
        for k in range(n_pairs):
            f, r = mk(), mk()
            if c == 0 and k == 0:
                f, r = poison, poison_r
            if c > 0 and (k == 0 or
                          (poison_all_last and c == n_clusters - 1)):
                # 3' end is the RC of cluster 0's primer 3' end (d2 = 0):
                # Loss = log10(2^len * 2^GC * 100) >= 3 for any len >= 5,
                # a guaranteed dimer once cluster 0 is accepted.  With
                # poison_all_last the final cluster is poisoned in EVERY
                # pair, so maximal mode must reject it to .next.xls (not
                # used in maximum mode, where it would dead-end).
                f = mk()[:9] + iupac.rc(poison[9:])
            fields += [f, r, "%d:%.2f:%.3f" % (150 + 10 * c, 50 + k, 0.9),
                       str(400 - 5 * k), "%d:%d" % (100 + k, 300 + k)]
        rows.append("\t".join(fields))
    return rows


@requires_reference
@pytest.mark.parametrize("method", ["T", "F"])
def test_shadow_get_maxprimerset(tmp_path, method):
    from multiprime_tpu.cli import main as climain
    rng = np.random.default_rng(31)
    rows = _candidate_rows(rng, poison_all_last=(method == "T"))
    rd = tmp_path / "ref"
    md = tmp_path / "mine"
    for d in (rd, md):
        d.mkdir()
        (d / "cand.txt").write_text("\n".join(rows) + "\n")
    run_ref("get_Maxprimerset.py",
            ["-i", str(rd / "cand.txt"), "-m", method,
             "-o", str(rd / "final.xls")])
    climain.main(["solve", "-i", str(md / "cand.txt"), "-m", method,
                  "-o", str(md / "final.xls")])
    assert (rd / "sort.cand.txt").read_bytes() \
        == (md / "sort.cand.txt").read_bytes()
    assert (rd / "final.xls").read_bytes() == (md / "final.xls").read_bytes()
    if method == "T":
        # str.rstrip(".xls") strips characters, not the suffix:
        # "final.xls" -> "fina" (reference quirk, replicated in our CLI)
        nxt = "final.xls".rstrip(".xls") + ".next.xls"
        assert (rd / nxt).read_bytes() == (md / nxt).read_bytes()
        assert len((rd / nxt).read_text()) > 0               # rejects exist


@requires_reference
def test_shadow_findimer(tmp_path):
    from multiprime_tpu.cli import main as climain
    from multiprime_tpu.utils import iupac
    rng = np.random.default_rng(41)
    lut = np.array(list("ACGT"))
    prims = ["".join(rng.choice(lut, size=18)) for _ in range(14)]
    prims[3] = prims[3][:10] + iupac.rc(prims[0][2:10])   # planted dimer
    prims[7] = "GGTAYGGYYTCAGRCATC"                       # degenerate
    fa_text = "".join(">Cluster_%d_F\n%s\n" % (i, s)
                      for i, s in enumerate(prims))
    rd = tmp_path / "ref"
    md = tmp_path / "mine"
    for d in (rd, md):
        d.mkdir()
        (d / "set.fa").write_text(fa_text)
    run_ref("finDimer.py", ["-i", str(rd / "set.fa"), "-n", "1",
                            "-t", "3.96", "-o", str(rd / "out")])
    climain.main(["findimer", "-i", str(md / "set.fa"), "-t", "3.96",
                  "-o", str(md / "out")])
    assert (rd / "out").read_bytes() == (md / "out").read_bytes()
    assert (rd / "out.dimer_num").read_bytes() \
        == (md / "out.dimer_num").read_bytes()
    assert (rd / "out").read_text().count("\n") > 1       # hits exist


@requires_reference
@pytest.mark.parametrize("gini", ["unified", "H_bonds"])
def test_shadow_free_energy(tmp_path, gini):
    from multiprime_tpu.cli import tools
    rng = np.random.default_rng(13)
    primers = _random_seqs(rng, 30, 14, 24)
    primers += ["GGTAYGGYYTCAGRCATC", "ACGTACGT", "ATTA", "TGCA"]
    fa = tmp_path / "p.fa"
    fa.write_text("".join(">p%d\n%s\n" % (i, s)
                          for i, s in enumerate(primers)))
    ref_out = tmp_path / ("ref_%s.xls" % gini)
    run_ref("free_energy.py", ["-i", str(fa), "-f", "fa", "-g", gini,
                               "-o", str(ref_out)])
    my_out = tmp_path / ("my_%s.xls" % gini)
    tools.dg_main(["-i", str(fa), "-f", "fa", "-g", gini,
                   "-o", str(my_out)])
    assert ref_out.read_bytes() == my_out.read_bytes()
