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


@requires_reference
def test_gradient_join_shadow(tmp_path):
    """Primer_pair_coverage_for_gradient.py vs metrics.gradient_join:
    byte-identical join of designed coverage vs BWT pair counts."""
    from multiprime_tpu.validate import metrics
    cand = tmp_path / "cand.txt"
    pairs = []
    for start, stop, cov in [(59, 218, "0.918"), (170, 322, "0.77"),
                             (28, 187, "1.0")]:
        pairs += ["ACGTACGTACGTACGTAA", "TTGGCCAATTGGCCAATT",
                  "%d:50.1:%s" % (stop - start + 1, cov), "7",
                  "%d:%d" % (start, stop)]
    cand.write_text(str(cand) + "\t" + "\t".join(pairs) + "\t\n")
    pair_num = tmp_path / "scan.out.pair.num"
    pair_num.write_text(
        "Primer_F\tPrimer_R\tPair_num\ttarget accession number\n"
        "Cluster_0.fa_59_F\tCluster_0.fa_218_R\t9\t8\n"
        "Cluster_1.fa_170_F\tCluster_1.fa_322_R\t5\t5\n"
        "Cluster_9.fa_999_F\tCluster_9.fa_1200_R\t2\t2\n")
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text("".join(">s%d\nACGT\n" % i for i in range(12)))
    out_ref = tmp_path / "join.ref.tsv"
    run_ref("Primer_pair_coverage_for_gradient.py",
            ["-i", str(cand), "-r", str(ref_fa), "-c", str(pair_num),
             "-s", "5", "-o", str(out_ref)])
    out_mine = tmp_path / "join.mine.tsv"
    metrics.gradient_join(str(cand), str(pair_num), str(ref_fa),
                          str(out_mine), step=5)
    assert out_mine.read_text() == out_ref.read_text()
    assert len(out_ref.read_text().splitlines()) == 3   # 2 joined rows


@requires_reference
def test_dimer_exp_correlation_shadow(tmp_path):
    """dimer_prediction_exp_correlation.py vs metrics.dimer_exp_correlation:
    byte-identical per-pair means vs experimental signal."""
    from multiprime_tpu.validate import metrics
    fin = tmp_path / "findimer.tsv"
    rows = ["Primer header line"]
    for p1, dg, p2, loss in [(">A", -4.5, ">B", 2.7), (">B", -6.0, ">A", 4.1),
                             (">A", -1.25, ">C", 0.9), (">C", -3.3, ">C", 3.96)]:
        fields = [p1, "x", "x", str(dg), "x", "x", "x", p2, "x", "x",
                  str(loss)]
        rows.append("\t".join(fields))
    fin.write_text("\n".join(rows) + "\n")
    exp = tmp_path / "exp.tsv"
    exp.write_text("B\tA\t3\nC\tA\t2\nA\tB\t4\n")
    out_ref = tmp_path / "corr.ref.tsv"
    run_ref("dimer_prediction_exp_correlation.py",
            ["-i", str(fin), "-e", str(exp), "-o", str(out_ref)])
    out_mine = tmp_path / "corr.mine.tsv"
    metrics.dimer_exp_correlation(str(fin), str(exp), str(out_mine))
    assert out_mine.read_text() == out_ref.read_text()
    assert len(out_ref.read_text().splitlines()) == 3


@requires_reference
def test_prepare_pickle_shadow(tmp_path):
    """prepare_pickle.py txt + fa modes vs stages.prepare_pickle_*:
    identical pickled dicts (incl. the merged->header and last-seq-line
    quirks)."""
    import pickle
    from multiprime_tpu.pipeline import stages
    txt = tmp_path / "table.tsv"
    txt.write_text("A1\tvirus1\t9606\nA2\tvirus2\t10090\n"
                   "A1\tvirus1b\t9913\n")
    for value in ("T", "2"):
        out_ref = tmp_path / ("t%s.ref.pkl" % value)
        run_ref("prepare_pickle.py",
                ["-i", str(txt), "-f", "txt", "-n", "0", "-v", value,
                 "-o", str(out_ref)])
        out_mine = tmp_path / ("t%s.mine.pkl" % value)
        stages.prepare_pickle_txt(str(txt), str(out_mine), column=0,
                                  value=value)
        ref_d = pickle.load(open(out_ref, "rb"))
        mine_d = pickle.load(open(out_mine, "rb"))
        assert dict(ref_d) == dict(mine_d)
    fa = tmp_path / "seqs.fa"
    fa.write_text(">FJ1.1 partial cds >FJ2.1 another cds\nACGTACGT\n"
                  ">KX9.2 something\nTTTT\nGGGG\n")
    for head in ("T", "F"):
        out_ref = tmp_path / ("f%s.ref.pkl" % head)
        run_ref("prepare_pickle.py",
                ["-i", str(fa), "-f", "fa", "-t", head, "-o", str(out_ref)])
        out_mine = tmp_path / ("f%s.mine.pkl" % head)
        stages.prepare_pickle_fa(str(fa), str(out_mine), headinfo=head)
        assert pickle.load(open(out_ref, "rb")) == \
            pickle.load(open(out_mine, "rb"))


@requires_reference
def test_extract_value_from_dict_shadow(tmp_path):
    """extract_value_from_dict.py vs stages.extract_value_from_dict."""
    from multiprime_tpu.pipeline import stages
    fa = tmp_path / "db.fa"
    fa.write_text(">FJ1.1 x\nACGT\n>KX9.2 y\nTTTT\n>MM3.3 z\nGGGG\n")
    pkl = tmp_path / "db.pkl"
    stages.prepare_pickle_fa(str(fa), str(pkl), headinfo="T")
    query = tmp_path / "query.fa"
    query.write_text(">FJ1.1\nACGT\n>MM3.3\nGGGG\n>ZZ0.0\nAAAA\n")
    for head in ("F", "T"):
        out_ref = tmp_path / ("e%s.ref.txt" % head)
        run_ref("extract_value_from_dict.py",
                ["-i", str(query), "-d", str(pkl), "-n", "0", "-t", head,
                 "-o", str(out_ref)])
        out_mine = tmp_path / ("e%s.mine.txt" % head)
        stages.extract_value_from_dict(str(query), str(pkl),
                                       str(out_mine), column=0, head=head)
        assert out_mine.read_text() == out_ref.read_text()
