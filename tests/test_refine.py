"""MSA profile-refinement properties (align/refine.py)."""

import numpy as np
import pytest

from multiprime_tpu.align import centerstar, refine


def _q(rows):
    return refine.agreement_score(refine.encode_rows(rows))


def test_shifted_row_snaps_to_consensus():
    rows = ["ACGTACGT--", "ACGTACGT--", "ACGTACGT--", "--ACGTACGT"]
    out = refine.refine_msa(rows)
    assert out == ["ACGTACGT"] * 4


def test_internal_indel_disagreement_resolved():
    rows = ["AAACCC-GGTTT", "AAACCC-GGTTT", "AAA-CCCGGTTT", "AAACCCG-GTTT"]
    out = refine.refine_msa(rows)
    assert len(set(out)) == 1          # all rows identical after polish
    assert out[0].replace("-", "") == "AAACCCGGTTT"


def test_residues_preserved_and_q_monotone():
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("ACGT"), size=120))
    seqs = []
    for _ in range(12):
        s = list(base)
        for _ in range(6):                      # point mutations
            s[rng.integers(len(s))] = rng.choice(list("ACGT"))
        if rng.random() < 0.5:                  # indel
            pos = int(rng.integers(10, len(s) - 10))
            del s[pos:pos + int(rng.integers(1, 4))]
        seqs.append("".join(s))
    _, rows = centerstar.center_star_msa([str(i) for i in range(12)], seqs)
    out = refine.refine_msa(rows, iterations=3)
    assert len({len(r) for r in out}) == 1      # rectangular
    for before, after in zip(rows, out):
        assert before.replace("-", "") == after.replace("-", "")
    assert _q(out) >= _q(refine.drop_gap_columns(rows))


def test_refine_noop_cases():
    assert refine.refine_msa(["ACGT"]) == ["ACGT"]
    assert refine.refine_msa([], iterations=2) == []
    rows = ["ACGT", "ACGT"]
    assert refine.refine_msa(rows, iterations=0) == rows


def test_drop_gap_columns():
    rows = ["A-C-", "A-G-"]
    assert refine.drop_gap_columns(rows) == ["AC", "AG"]
