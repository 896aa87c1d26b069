"""QC-report structural parity vs the shipped mfeprimer-3 files.

The reference shells out to the closed-source mfeprimer Go binary
(multiPrime.py:412-414, 433-435); its reports for the golden core set are
shipped at /root/reference/test_data/results/Core_primers_set/
core_final_maxprimers_set.fa.{hairpin,dimer}.  Our reports use the
in-package thermodynamics, so Tm/Dg values differ by parameterisation —
but the report STRUCTURE (header + per-expansion table + findings
section) and the parameterisation-independent columns (expansion
sequences, lengths, GC%) must line up row-for-row.
"""

import os
import re

import pytest

GOLDEN = ("/root/reference/test_data/results/Core_primers_set/"
          "core_final_maxprimers_set.fa")

ROW = re.compile(r"^(\S+)\.(\d+)\s+([ACGTN]+)\s+(\d+)\s+([\d.]+)\s+"
                 r"(-?[\d.]+)\s+(-?[\d.]+)\s*$")


def parse_report(path):
    """-> (title_line, {(primer_name, seq): (length, gc, tm, dg)})."""
    rows = {}
    with open(path, encoding="utf-8") as f:
        title = f.readline().strip()
        for line in f:
            m = ROW.match(line)
            if m:
                rows[(m.group(1), m.group(3))] = (
                    int(m.group(4)), float(m.group(5)),
                    float(m.group(6)), float(m.group(7)))
    return title, rows


@pytest.mark.skipif(not os.path.exists(GOLDEN + ".hairpin"),
                    reason="golden tree not present")
def test_report_structure_matches_mfeprimer(tmp_path):
    from multiprime_tpu.validate import reports
    stamp = reports.content_stamp(GOLDEN)
    ours_h = tmp_path / "our.hairpin"
    ours_d = tmp_path / "our.dimer"
    reports.hairpin_report(GOLDEN, str(ours_h), timestamp=stamp)
    reports.dimer_report(GOLDEN, str(ours_d), timestamp=stamp)
    for theirs, ours, kind in ((GOLDEN + ".hairpin", ours_h, "Hairpin"),
                               (GOLDEN + ".dimer", ours_d, "Dimer")):
        t_title, t_rows = parse_report(theirs)
        o_title, o_rows = parse_report(str(ours))
        assert kind in t_title and kind in o_title
        # same expansion universe: every (primer, expansion) mfeprimer
        # tabulates, we tabulate — and nothing else
        assert set(o_rows) == set(t_rows), kind
        for key, (t_len, t_gc, _, _) in t_rows.items():
            o_len, o_gc, o_tm, o_dg = o_rows[key]
            assert o_len == t_len
            # GC% is parameterisation-independent: must agree to 2dp
            assert abs(o_gc - t_gc) < 0.005, (key, o_gc, t_gc)
            # own thermo values are finite and sane
            assert 0 < o_tm < 100 and o_dg < 0
    # the golden hairpin verdict for this set is "No hairpins found." —
    # our engine agrees on the same primers
    assert "No hairpins found." in ours_h.read_text()


def test_report_determinism(tmp_path):
    """content_stamp makes re-runs byte-identical; explicit/env timestamps
    override; bare default falls back to wall clock."""
    from multiprime_tpu.validate import reports
    fa = tmp_path / "p.fa"
    fa.write_text(">X_F\nGGTAYGGYYTCAGRCATC\n>X_R\nCRACRTATTTCTCDAGGT\n")
    stamp = reports.content_stamp(str(fa))
    a, b = tmp_path / "a", tmp_path / "b"
    reports.hairpin_report(str(fa), str(a), timestamp=stamp)
    reports.hairpin_report(str(fa), str(b), timestamp=stamp)
    assert a.read_bytes() == b.read_bytes()
    assert stamp in a.read_text()
    os.environ["MPTPU_REPORT_TIMESTAMP"] = "fixed-env-stamp"
    try:
        reports.dimer_report(str(fa), str(a))
        assert "fixed-env-stamp" in a.read_text()
    finally:
        del os.environ["MPTPU_REPORT_TIMESTAMP"]
