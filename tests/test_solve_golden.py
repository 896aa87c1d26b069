"""Golden parity for the greedy set solve, finDimer, and glue stages."""

import pathlib

import pytest

from multiprime_tpu.solve import maxset
from multiprime_tpu.validate import findimer
from multiprime_tpu.pipeline import stages
from .conftest import requires_reference

GOLD = pathlib.Path("/root/reference/test_data/results/Primers_set")


@requires_reference
def test_solve_chain_bit_identical(tmp_path):
    primers = maxset.parse_and_sort(
        str(GOLD / "candidate_primers_sets.txt"), str(tmp_path / "sort.txt"))
    assert (tmp_path / "sort.txt").read_text() \
        == (GOLD / "sort.candidate_primers_sets.txt").read_text()
    maxset.greedy_maximal(primers, str(tmp_path / "final.xls"),
                          str(tmp_path / "final.next.xls"), step=5)
    assert (tmp_path / "final.xls").read_text() \
        == (GOLD / "final_maxprimers_set.xls").read_text()
    assert (tmp_path / "final.next.xls").read_text() \
        == (GOLD / "final_maxprimers_set.next.xls").read_text()
    stages.primerset_format(str(tmp_path / "final.xls"),
                            str(tmp_path / "final.fa"))
    assert (tmp_path / "final.fa").read_text() \
        == (GOLD / "final_maxprimers_set.fa").read_text()
    rows = findimer.scan(
        findimer.parse_primer_fasta(str(tmp_path / "final.fa")),
        threshold=3.96)
    findimer.write_outputs(rows, str(tmp_path / "final.fa.findimer"))
    assert (tmp_path / "final.fa.findimer").read_text() \
        == (GOLD / "final_maxprimers_set.fa.findimer").read_text()
    assert (tmp_path / "final.fa.findimer.dimer_num").read_text() \
        == (GOLD / "final_maxprimers_set.fa.findimer.dimer_num").read_text()


def test_dimer_ledger_incremental_equivalence():
    """The incremental ledger must agree with a full rescan."""
    from multiprime_tpu.utils import iupac
    from multiprime_tpu.thermo import exact as thermo

    def full_rescan(primer_f, primer_r, accepted):
        pool = set(iupac.expand(primer_f)) | set(iupac.expand(primer_r)) \
            | set(accepted)
        ends = set()
        for p in pool:
            ends |= maxset.suffix_ends(p)
        for end in ends:
            for p in pool:
                if maxset._end_hits_primer(end, p):
                    return True
        return False

    pairs = [("ACGGTCAGTACGGTCAGT", "TGCCAGTCATGCCAGTCA"),
             ("AATTGGCCAATTGGCCAA", "TTGGAACCTTGGAACCTT"),
             ("GACTGACTGACTGACTGA", "CTGACTGACTGACTGACT")]
    ledger = maxset.DimerLedger()
    accepted = []
    for f, r in pairs:
        expect = full_rescan(f, r, accepted)
        got = ledger.pair_is_dimer(f, r)
        assert got == expect, (f, r)
        if not got:
            ledger.accept(f, r)
            accepted.extend(iupac.expand(f))
            accepted.extend(iupac.expand(r))


def test_greedy_maximal_spill(tmp_path):
    # A cluster whose only pair dimers against the accepted set spills to next.
    rows = [
        ["c1", "ACGGTCAGTACGGTCAGT", "TGCCAGTCATGCCAGTCA", "x", "1", "0:1"],
        ["c2", "ACTGACCGTACTGACCGT", "ACTGACCGTACTGACCGT", "x", "1", "0:1"],
    ]
    clique = maxset.greedy_maximal(rows, str(tmp_path / "o.xls"),
                                   str(tmp_path / "o.next.xls"), step=5)
    text = (tmp_path / "o.xls").read_text()
    assert text.startswith("#Primer\t")
    assert len(clique) >= 1


def test_pair_exhausted_cluster_rows_survive_formatting(tmp_path):
    """get_Maxprimerset writes a path-only row (empty cells) for a cluster
    whose every candidate pair dimers against the accepted set
    (get_Maxprimerset.py:346-348); the reference's primerset_format and
    extract_PCR_product CRASH on such rows (str.strip eats the tabs).
    First fired at the 1M-seq envelope (111 rows) — our formatter and PCR
    parser must skip them and keep every complete row."""
    from multiprime_tpu.validate import pcr
    xls = tmp_path / "final.xls"
    xls.write_text(
        "#Primer\tPrimer_rank\tPrimer_F\tPrimer_R\tc4\tc5\tc6\n"
        "/x/Cluster_0_5.candidate.primers.txt\t1\tACGT\tTTGC\t"
        "100:50:0.9\t5\t3:90\n"
        "/x/Cluster_1_1.candidate.primers.txt\t\t\t\t\t\t\n"
        "/x/Cluster_2_5.candidate.primers.txt\t1\tGGCA\tAACC\t"
        "120:51:0.8\t5\t7:99\n")
    fa = tmp_path / "final.fa"
    stages.primerset_format(str(xls), str(fa))
    text = fa.read_text()
    assert text == (">Cluster_0_5_F\nACGT\n>Cluster_0_5_R\nTTGC\n"
                    ">Cluster_2_5_F\nGGCA\n>Cluster_2_5_R\nAACC\n")
    pairs = pcr.parse_pairs_xls(str(xls))
    assert len(pairs) == 2
    assert pairs["Cluster_0_5_3_F_Cluster_0_5_90"] == ("ACGT", "TTGC")


def test_txt2fa_and_core_extraction(tmp_path):
    row = "path/Cluster_7_25.candidate.primers.txt\tAAAA\tTTTT\t100:50:0.9\t25\t3:90\n"
    inp = tmp_path / "cand.txt"
    inp.write_text(row)
    stages.txt2fa(str(inp), str(tmp_path / "fa"), str(tmp_path / "num"), step=5)
    assert (tmp_path / "num").read_text() == "Cluster_7_25\t2\n"
    fa = (tmp_path / "fa" / "Cluster_7_25.candidate.primers.fa").read_text()
    assert ">Cluster_7_25_3_F\nAAAA\n>Cluster_7_25_90_R\nTTTT\n" == fa
    stages.core_extraction(str(inp), str(tmp_path / "core.txt"), 10)
    assert (tmp_path / "core.txt").read_text() == row
    stages.core_extraction(str(inp), str(tmp_path / "core2.txt"), 30)
    assert (tmp_path / "core2.txt").read_text() == ""


def test_seq_format(tmp_path):
    inp = tmp_path / "in.fa"
    inp.write_text(">A1:xx extra words\n" + "ACGT" * 60 + "\n"
                   ">B2\nACGU\n>C3\n" + "GGGG" * 60 + "\n")
    out = tmp_path / "out.fa"
    stages.seq_format(str(inp), str(out), gc_threshold=0.8, min_length=200)
    text = out.read_text()
    assert ">A1\n" in text            # ID cut at ':'
    assert "B2" not in text           # too short -> filtered
    assert "C3" not in text           # GC 1.0 -> filtered
    filt = (tmp_path / "out.filtered.fa").read_text()
    assert "B2" in filt and "C3" in filt


def test_dimer_ledger_factored_matches_rescan():
    """The set-factored pair_is_dimer must equal the direct rescan
    formulation across a growing accepted core (degenerate fuzz)."""
    import random

    from multiprime_tpu.solve import maxset

    rng = random.Random(9)
    codes = "ACGTRYSWKM"

    def mk():
        return "".join(
            rng.choice(codes) if rng.random() < 0.12 else rng.choice("ACGT")
            for _ in range(rng.choice([18, 20, 22])))

    led_new = maxset.DimerLedger()
    led_ref = maxset.DimerLedger()
    accepted = 0
    for trial in range(150):
        f, r = mk(), mk()
        a = led_new.pair_is_dimer(f, r)
        assert a == led_ref._pair_is_dimer_ref(f, r), (f, r)
        if not a and accepted < 40 and rng.random() < 0.5:
            led_new.accept(f, r)
            led_ref.accept(f, r)
            accepted += 1
    # snapshot/restore keeps the incremental hit-end set consistent
    snap = led_new.snapshot()
    before = set(led_new.core_hit_ends)
    f, r = mk(), mk()
    if not led_new.pair_is_dimer(f, r):
        led_new.accept(f, r)
    led_new.restore(snap)
    assert led_new.core_hit_ends == before
    assert led_new.core_ends == led_ref.core_ends


@requires_reference
def test_rowstore_equivalence(tmp_path, monkeypatch):
    """File-backed RowStore path (forced via MPTPU_SOLVE_ROWSTORE_BYTES=0)
    must produce byte-identical sort/final/next outputs in BOTH greedy
    modes vs the in-memory row path."""
    agg = str(GOLD / "candidate_primers_sets.txt")
    mem = maxset.parse_and_sort(agg, str(tmp_path / "sort_mem.txt"))
    assert not isinstance(mem, maxset.RowStore)
    maxset.greedy_maximal(mem, str(tmp_path / "mem.xls"),
                          str(tmp_path / "mem.next.xls"), step=5)
    mem2 = maxset.parse_and_sort(agg, str(tmp_path / "sort_mem2.txt"))
    maxset.greedy_maximum(mem2, str(tmp_path / "mem.max.xls"), step=5)

    monkeypatch.setenv("MPTPU_SOLVE_ROWSTORE_BYTES", "0")
    store = maxset.parse_and_sort(agg, str(tmp_path / "sort_fs.txt"))
    assert isinstance(store, maxset.RowStore)
    assert (tmp_path / "sort_fs.txt").read_bytes() \
        == (tmp_path / "sort_mem.txt").read_bytes()
    maxset.greedy_maximal(store, str(tmp_path / "fs.xls"),
                          str(tmp_path / "fs.next.xls"), step=5)
    assert (tmp_path / "fs.xls").read_bytes() \
        == (tmp_path / "mem.xls").read_bytes()
    assert (tmp_path / "fs.next.xls").read_bytes() \
        == (tmp_path / "mem.next.xls").read_bytes()
    store2 = maxset.parse_and_sort(agg, str(tmp_path / "sort_fs2.txt"))
    maxset.greedy_maximum(store2, str(tmp_path / "fs.max.xls"), step=5)
    assert (tmp_path / "fs.max.xls").read_bytes() \
        == (tmp_path / "mem.max.xls").read_bytes()
