"""Coverage for the secondary standalone components (SURVEY.md section 2.2):
kmer filter, specificity scan, gradient/dimer correlation metrics, dege
expansion CLI."""

import numpy as np

from multiprime_tpu.cli import main as cli
from multiprime_tpu.validate import metrics, specificity


def test_kmer_filter_cli(tmp_path, capsys):
    fa = tmp_path / "k.fa"
    # k1 passes; k2 is all-G (GC + run filtered); k3 ends in 4 G/C (clamp)
    fa.write_text(">k1\nACGTTGCACGTTGCACAT\n"
                  ">k2\nGGGGGGGGGGGGGGGGGG\n"
                  ">k3\nACGTTGCACGTTGCGCGC\n")
    out = tmp_path / "k.filtered.fa"
    rc = cli.main(["kmer-filter", "-i", str(fa), "-g", "0.2,0.7",
                   "-o", str(out)])
    kept = out.read_text() if out.exists() else capsys.readouterr().out
    assert "k1" in kept
    assert "k2" not in kept


def test_specificity_scan(tmp_path):
    prim = tmp_path / "p.fa"
    prim.write_text(">P1F\nACGTACGTACGTACGTAC\n>P1R\nTTGCAGGCAATTCCGGAA\n")
    bg = tmp_path / "bg.fa"
    # background genome contains F and RC(R) 200 bp apart -> off-target hit
    import multiprime_tpu.utils.iupac as iupac
    mid = "".join(np.random.default_rng(0).choice(list("ACGT"), size=200))
    bg.write_text(">G1\n" + "ACGTACGTACGTACGTAC" + mid
                  + iupac.rc("TTGCAGGCAATTCCGGAA") + "AAAA\n")
    out = tmp_path / "spec.out"
    specificity.run(str(prim), str(bg), str(out), mm=1, term=0,
                    product_size=(50, 2000))
    body = out.read_text()
    assert "G1" in body            # predicted off-target amplicon reported


def test_gradient_and_dimer_correlation_metrics():
    joined = metrics.pair_coverage_join(
        [("F1", "R1", 120), ("F2", "R2", 30)],
        {"F1\tR1": 118})
    assert joined == [("F1", "R1", 120, 118), ("F2", "R2", 30, 0)]
    r = metrics.dimer_correlation([1, 2, 3, 4], [1.1, 2.2, 2.9, 4.4])
    assert r > 0.99
    assert metrics.dimer_correlation([1, 1, 1], [1, 2, 3]) == 0.0


def test_expand_cli(tmp_path, capsys):
    fa = tmp_path / "d.fa"
    fa.write_text(">D\nACR\n")
    out = tmp_path / "d.exp.fa"
    rc = cli.main(["expand", "-i", str(fa), "-o", str(out)])
    text = out.read_text() if out.exists() else capsys.readouterr().out
    assert "ACA" in text and "ACG" in text


def test_mfeprimer_style_reports(tmp_path):
    from multiprime_tpu.validate import reports
    from multiprime_tpu.utils import iupac
    fa = tmp_path / "set.fa"
    # H1 folds back on itself (stem = RC of its 5' 5-mer after a 9-nt loop);
    # D2 carries the RC of D1's 3' end -> cross-dimer
    stem5 = "GCACG"
    h1 = stem5 + "TTTTAAAGG" + iupac.rc(stem5) + "AAT"
    d1 = "ACGGTCAGTACGGTCAGT"
    d2 = "TTGATGCA" + iupac.rc(d1[-10:])
    fa.write_text(">H1\n%s\n>D1\n%s\n>D2\n%s\n" % (h1, d1, d2))
    hp = reports.hairpin_report(str(fa), str(tmp_path / "set.hairpin"))
    dm = reports.dimer_report(str(fa), str(tmp_path / "set.dimer"))
    hp_text = open(hp).read()
    dm_text = open(dm).read()
    assert "H1" in hp_text and "hairpin" in hp_text
    assert "Hairpin" in hp_text          # mfeprimer-style header
    assert "D1" in dm_text.split("Dimer findings")[1]


def test_nondimer_filter(tmp_path):
    """primer_filter.sh equivalent: a primer whose 3' end reverse-
    complements into a pool primer is dropped; a clean one survives."""
    from multiprime_tpu.cli import main as cli
    from multiprime_tpu.utils import iupac
    pool_primer = "ACGGTCATGCCTGAATGGCA"
    # RC of the pool 3' end => a 3'-3' dimer with d2=0 (high Loss)
    bad = "TTGATTAGCA" + iupac.rc(pool_primer[-10:])
    clean = "CCCCCCCCCCCCCCCCCCCC"            # RC(GGGGG...) occurs nowhere
    new = tmp_path / "new.fa"
    new.write_text(">bad\n%s\n>clean\n%s\n" % (bad, clean))
    pool = tmp_path / "pool.fa"
    pool.write_text(">pool1\n%s\n" % pool_primer)
    out = tmp_path / "clean.fa"
    cli.main(["nondimer-filter", "-i", str(new), "-p", str(pool),
              "-o", str(out)])
    text = out.read_text()
    assert ">clean" in text and ">bad" not in text


def test_pcr_corpus_path_matches_per_pair_reader(tmp_path):
    """The batched corpus PCR scan must equal the reference's per-pair
    file reader on planted and random degenerate pairs."""
    import random

    from multiprime_tpu.validate import pcr

    rng = random.Random(3)
    codes = "ACGTRYSWKM"
    ref = tmp_path / "t.fa"
    seqs = ["".join(rng.choice("ACGT") for _ in range(400))
            for _ in range(40)]
    with open(ref, "w") as f:
        for i, s in enumerate(seqs):
            f.write(">t%d desc\n%s\n" % (i, s))
    corpus = pcr._Corpus(str(ref))

    def mk(n):
        return "".join(rng.choice(codes) if rng.random() < 0.15
                       else rng.choice("ACGT") for _ in range(n))

    for trial in range(30):
        F, R = mk(18), mk(18)
        assert pcr._pcr_products_corpus(F, R, corpus) == \
            pcr.pcr_products(F, R, str(ref)), (F, R)
    # planted F + RC(R) product
    for trial in range(20):
        t = rng.randrange(40)
        F = "".join(rng.choice("ACGT") for _ in range(18))
        R = "".join(rng.choice("ACGT") for _ in range(18))
        seq = seqs[t]
        pos = rng.randrange(0, 250)
        seq2 = seq[:pos] + F + seq[pos + 18:]
        pos2 = rng.randrange(pos + 30, 380)
        seq2 = seq2[:pos2] + pcr._rc(R) + seq2[pos2 + 18:]
        ref2 = tmp_path / ("t2_%d.fa" % trial)
        with open(ref2, "w") as f:
            for i, ln in enumerate(seqs):
                f.write(">t%d\n%s\n" % (i, seq2 if i == t else ln))
        assert pcr._pcr_products_corpus(F, R, pcr._Corpus(str(ref2))) == \
            pcr.pcr_products(F, R, str(ref2)), (F, R, t)


def test_pcr_batch_occ_matches_corpus_path(tmp_path):
    """The one-scan batched PCR path (_batch_occurrences +
    _pcr_products_occ) is byte-identical to the per-pair corpus find
    loops across degenerate primers, wrapped FASTA lines, N characters,
    overlapping F/R sites and no-product targets."""
    import numpy as np

    from multiprime_tpu.utils import iupac
    from multiprime_tpu.validate import pcr

    rng = np.random.default_rng(7)
    lut = np.array(list("ACGT"))
    for trial in range(6):
        pairs = {}
        planted = []
        for k in range(5):
            f = "".join(rng.choice(lut, size=int(rng.integers(12, 20))))
            r = "".join(rng.choice(lut, size=int(rng.integers(12, 20))))
            if k == 1:                    # degenerate pair
                f = f[:4] + "Y" + f[5:10] + "R" + f[11:]
            pairs["C%d_1_F_C%d_99" % (k, k)] = (f, r)
            planted.append((iupac.expand(f)[0],
                            pcr._rc(iupac.expand(r)[0])))
        ref = tmp_path / ("ref%d.fa" % trial)
        with open(ref, "w") as fh:
            for i in range(25):
                body = "".join(rng.choice(lut, size=300))
                if i % 3 == 0:
                    fseq, rc = planted[int(rng.integers(len(planted)))]
                    at = int(rng.integers(0, 80))
                    stop = at + len(fseq) + 120
                    body = (body[:at] + fseq + body[at + len(fseq):stop]
                            + rc + body[stop + len(rc):])
                if i % 7 == 0:
                    body = body[:50] + "N" * 8 + body[58:]
                if i % 5 == 0:            # wrapped fasta: two lines, one
                    fh.write(">t%d\n%s\n%s\n"    # header (dict-overwrite
                             % (i, body[:150], body[150:]))  # semantics)
                else:
                    fh.write(">t%d\n%s\n" % (i, body))
        corpus = pcr._Corpus(str(ref))
        occ = pcr._batch_occurrences(pairs, corpus)
        assert occ is not None
        n_products = 0
        for key, (f, r) in pairs.items():
            a = pcr._pcr_products_corpus(f, r, corpus)
            b = pcr._pcr_products_occ(f, r, corpus, occ)
            assert a == b, (trial, key)
            n_products += len(a[0])
        assert trial != 0 or n_products > 0


def test_pcr_occ_summary_counts_match_bodies(tmp_path):
    """want_bodies=False returns the same keys in the same order as the
    body-building walk (counts, covered/uncovered sets identical)."""
    import numpy as np

    from multiprime_tpu.utils import iupac
    from multiprime_tpu.validate import pcr

    rng = np.random.default_rng(17)
    lut = np.array(list("ACGT"))
    f = "".join(rng.choice(lut, size=16))
    r = "".join(rng.choice(lut, size=16))
    rc = pcr._rc(r)
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as fh:
        for i in range(15):
            body = "".join(rng.choice(lut, size=260))
            if i % 2 == 0:
                body = body[:20] + f + body[36:200] + rc + body[216:]
            # duplicate header with one producing + one barren line
            name = "t%d" % (i // 2) if i < 4 else "t%d" % i
            fh.write(">%s\n%s\n" % (name, body))
    corpus = pcr._Corpus(str(ref))
    pairs = {"k": (f, r)}
    occ = pcr._batch_occurrences(pairs, corpus)
    with_bodies = pcr._pcr_products_occ(f, r, corpus, occ, want_bodies=True)
    keys_only = pcr._pcr_products_occ(f, r, corpus, occ, want_bodies=False)
    assert list(with_bodies[0]) == list(keys_only[0])
    # want_bodies=False returns the produced INDEX set; the non-product
    # header list (dict-collapsed, first-seen order) must derive exactly
    produced = keys_only[1]
    derived, seen = [], set()
    for t, h in enumerate(corpus.headers):
        if t not in produced and h not in seen:
            seen.add(h)
            derived.append(h)
    assert list(with_bodies[1]) == derived
    assert len(with_bodies[0]) > 0
    # the duplicate-header case must actually occur (a producing and a
    # barren line sharing a header) or this test checks nothing
    assert len(set(corpus.headers)) < len(corpus.headers)
    # run()-level: summary's dup-aware non-product counts and final
    # covered/uncovered sets must equal the full-body walk on this
    # duplicate-header corpus
    outs = {}
    for mode in ("full", "summary"):
        stast = tmp_path / (mode + ".xls")
        cov_s, unc_s = pcr.run(pairs, str(ref), str(tmp_path / mode),
                               str(stast), products=mode)
        outs[mode] = (stast.read_text(), cov_s, unc_s)
    assert outs["full"] == outs["summary"]
