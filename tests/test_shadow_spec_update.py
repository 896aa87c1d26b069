"""Live shadow parity for primer_specificity.py and Primer_set_update.py.

Neither reference script can run its bowtie stage (no bowtie in the image),
but both skip mapping when the .for.sam/.rev.sam files already exist
(primer_specificity.py:300-320) — so we fabricate those SAM files from an
exhaustive host-side scan (the exact alignments bowtie -a would report,
with true MD tags) and let the reference execute its real get_term, MD
trailing-run filter, F x R join and output writers.  The dimer half of
Primer_set_update needs no bowtie at all and shadows end-to-end.

Set-iteration-ordered outputs (the reference uses set() for end lists and
gene lists) are compared under matching PYTHONHASHSEED subprocesses, or as
order-independent row sets where the reference's own order is scheduling-
dependent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from multiprime_tpu.utils import iupac

from .conftest import requires_reference

SCRIPTS = "/root/reference/scripts"


def _mutate(s, pos, rng):
    alt = [c for c in "ACGT" if c != s[pos]]
    return s[:pos] + str(rng.choice(alt)) + s[pos + 1:]


def _md_tag(read, ref_win):
    """MD:Z value for an ungapped alignment (match runs + ref base at each
    mismatch)."""
    out, run = [], 0
    for a, b in zip(read, ref_win):
        if a == b:
            run += 1
        else:
            out.append(str(run))
            out.append(b)
            run = 0
    out.append(str(run))
    return "".join(out)


def _fabricate_sams(primers, targets, gene_ids, term_len, mm, out_prefix):
    """Write <prefix>.for.sam / <prefix>.rev.sam holding every <=mm-mismatch
    alignment of the expanded (3'-l-mer) primers, like bowtie2 -a would."""
    reads = []                    # (read_name, expansion)
    term_map = {}
    for name, seq in primers:
        key = seq[-term_len:] if term_len else seq
        term_map.setdefault(key, []).append(name)
    for key, names in term_map.items():
        merged = "_".join(dict.fromkeys(names))
        for j, e in enumerate(iupac.expand(key)):
            reads.append((merged + "_" + str(j), e))
    fwd, rev = [], []
    for gi, tgt in enumerate(targets):
        for pos in range(len(tgt)):
            for rname, e in reads:
                win = tgt[pos:pos + len(e)]
                if len(win) < len(e):
                    continue
                nm = sum(a != b for a, b in zip(e, win))
                if nm <= mm:
                    fwd.append((rname, gene_ids[gi], pos, e,
                                _md_tag(e, win)))
                rce = iupac.rc(e)
                nm = sum(a != b for a, b in zip(rce, win))
                if nm <= mm:
                    rev.append((rname, gene_ids[gi], pos, rce,
                                _md_tag(rce, win)))
    for path, rows, flag in ((out_prefix + ".for.sam", fwd, 0),
                             (out_prefix + ".rev.sam", rev, 16)):
        with open(path, "w") as f:
            for rname, gene, pos, seq, md in rows:
                f.write("\t".join(map(str, [
                    rname, flag, gene, pos + 1, 255, "%dM" % len(seq), "*",
                    0, 0, seq, "I" * len(seq), "MD:Z:" + md])) + "\n")
    return len(fwd), len(rev)


@requires_reference
def test_shadow_primer_specificity(tmp_path):
    rng = np.random.default_rng(23)
    lut = np.array(list("ACGT"))
    f1 = "GGTAYGGTTTCAGACATC"
    r1 = "CGACGTATTTCTCGAGGT"
    targets = []
    for i in range(9):
        body = "".join(rng.choice(lut, size=500))
        if i % 2 == 0:
            fe = iupac.expand(f1)[i % 2]
            body = body[:40] + fe + body[58:300] + iupac.rc(r1) + body[318:]
        if i == 3:   # 1-mismatch F hit far from the 3' end (passes MD veto)
            body = body[:40] + _mutate(iupac.expand(f1)[0], 2, rng) \
                + body[58:300] + iupac.rc(r1) + body[318:]
        if i == 5:   # mismatch inside the 3' terminal 4 bases (vetoed)
            body = body[:40] + _mutate(iupac.expand(f1)[0], 17, rng) \
                + body[58:300] + iupac.rc(r1) + body[318:]
        targets.append(body)
    gene_ids = ["g%d" % i for i in range(len(targets))]
    ref_fa = tmp_path / "background.fa"
    ref_fa.write_text("".join(">%s\n%s\n" % (g, t)
                              for g, t in zip(gene_ids, targets)))
    primers = [("setF", f1), ("setR", r1)]
    term_len, mm = 18, 1

    # reference run: fabricated SAMs next to the primer file skip bowtie
    refdir = tmp_path / "ref"
    refdir.mkdir()
    prim_ref = refdir / "primers.fa"
    prim_ref.write_text("".join(">%s\n%s\n" % p for p in primers))
    nf, nr = _fabricate_sams(primers, targets, gene_ids, term_len, mm,
                             str(refdir / "primers"))
    assert nf and nr
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "primer_specificity.py"),
         "-i", str(prim_ref), "-r", str(ref_fa), "-l", str(term_len),
         "-t", "4", "-m", str(mm), "-s", "100,1500", "-p", "1",
         "-o", str(refdir / "spec.out")],
        capture_output=True, text=True, timeout=300, cwd=SCRIPTS)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    # our run
    mydir = tmp_path / "mine"
    mydir.mkdir()
    prim_my = mydir / "primers.fa"
    prim_my.write_text(prim_ref.read_text())
    from multiprime_tpu.validate import specificity
    specificity.run(str(prim_my), str(ref_fa), str(mydir / "spec.out"),
                    term_len=term_len, term=4, mm=mm,
                    product_size=(100, 1500))

    # .out rows: reference gene order is set-iteration order -> compare sets
    ref_rows = (refdir / "spec.out").read_text().splitlines()
    my_rows = (mydir / "spec.out").read_text().splitlines()
    assert ref_rows[0] == my_rows[0]
    assert sorted(ref_rows[1:]) == sorted(my_rows[1:])
    assert len(my_rows) > 3
    # a veto check: the i==5 target must not appear via the F primer
    assert not any(row.startswith("g5\t40\t") for row in my_rows)
    assert any(row.startswith("g3\t") for row in my_rows)
    # .pair.num as parsed dicts (tie order among equal counts is dict order)
    def parse_pairnum(path):
        lines = open(path).read().splitlines()
        return lines[0], {tuple(l.split("\t")[:2]): tuple(l.split("\t")[2:])
                          for l in lines[1:]}
    assert parse_pairnum(refdir / "spec.out.pair.num") \
        == parse_pairnum(mydir / "spec.out.pair.num")
    assert (refdir / "spec.out.total.acc.num").read_bytes() \
        == (mydir / "spec.out.total.acc.num").read_bytes()
    # term.fa: same records (reference merges IDs via set -> compare parsed)
    def parse_fa(path):
        t = open(path).read().split(">")
        return sorted(x.strip() for x in t if x)
    assert parse_fa(refdir / "primers.term.fa") \
        == parse_fa(mydir / "primers.term.fa")


@requires_reference
@pytest.mark.parametrize("hashseed", ["0", "7"])
def test_shadow_primer_set_update_dimer(tmp_path, hashseed):
    """Dimer half of Primer_set_update (-f D): byte parity under matching
    PYTHONHASHSEED (the reference's end list + merged dict follow set
    iteration order)."""
    core = tmp_path / "core.fa"
    new = tmp_path / "new.fa"
    # cross-dimers: new N1 3' end is RC of core C1's 3' end; one shared
    # primer exercises the "name|name" merge; degenerate codes included
    c1 = "ACGGTCAGTACGGTCAGT"
    shared = "GGTAYGGTTTCAGACATC"
    n1 = "TTGATG" + iupac.rc(c1)[:12]
    core.write_text(">C1\n%s\n>SHARED\n%s\n" % (c1, shared))
    new.write_text(">N1\n%s\n>SHARED2\n%s\n" % (n1, shared))
    env = dict(os.environ, PYTHONHASHSEED=hashseed,
               PYTHONPATH="/root/repo")
    refdir = tmp_path / "ref"
    refdir.mkdir()
    (refdir / "core.fa").write_text(core.read_text())
    (refdir / "new.fa").write_text(new.read_text())
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "Primer_set_update.py"),
         "-n", str(refdir / "new.fa"), "-c", str(refdir / "core.fa"),
         "-f", "D", "-p", "1", "-o", str(refdir / "upd")],
        capture_output=True, text=True, timeout=300, cwd=SCRIPTS, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    my = subprocess.run(
        [sys.executable, "-c",
         "from multiprime_tpu.validate import update;"
         "update.check_new_primers(%r, %r, %r)"
         % (str(new), str(core), str(tmp_path / "upd.dimer"))],
        capture_output=True, text=True, timeout=300, env=env)
    assert my.returncode == 0, (my.stdout[-2000:], my.stderr[-2000:])
    assert (refdir / "upd.dimer").read_bytes() \
        == (tmp_path / "upd.dimer").read_bytes()
    assert (refdir / "upd.dimer.dimer_num").read_bytes() \
        == (tmp_path / "upd.dimer.dimer_num").read_bytes()
    body = (tmp_path / "upd.dimer").read_text().splitlines()
    assert len(body) > 1, "no dimer rows — shadow not exercising the engine"
