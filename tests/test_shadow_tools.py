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
