"""Thermodynamics unit tests.

Golden Tm values are taken from the reference's shipped results
(test_data/results/Clusters_primer/Cluster_0_20727.top.primer.out Tm column),
so these tests do not require the reference checkout.
"""

import math

from multiprime_tpu.thermo import exact
from multiprime_tpu.utils import iupac


def test_tm_degenerate_golden_values():
    # (primer, Tm) rows from the golden .top.primer.out
    cases = [
        ("ATGAAGACYRTYATTGCY", 49.15),
        ("TGAAGACYRTYATTGCYT", 49.86),
        ("ATCATTGCYTTDAGCTRC", 49.93),
        ("GGTAYGGYYTCAGRCATC", 53.33),
        ("CRACRTATTTCTCDAGGT", 48.41),
        ("GCAACATTTGCATTTGAD", 49.11),
    ]
    for primer, tm in cases:
        assert exact.tm_degenerate_mean(primer) == tm


def test_tm_plain():
    # A pure sequence's mean equals its own Tm.
    t = exact.tm("ACGTACGTACGTACGTAA")
    assert exact.tm_degenerate_mean("ACGTACGTACGTACGTAA") == t
    assert 0 < t < 100


def test_symmetry():
    # The reference's "symmetry" pairs position i with position half+i
    # (its complement() already reverses, cancelling the explicit [::-1]):
    # true RC-palindromes like ACGT / ATGCAT do NOT qualify.
    assert not exact.is_symmetric("ACGT")
    assert not exact.is_symmetric("ATGCAT")
    assert exact.is_symmetric("ACGTGC")        # ACG | TGC elementwise comp
    assert exact.is_symmetric("AT")
    assert not exact.is_symmetric("ACGTA")     # odd length
    assert not exact.is_symmetric("AAAAAA")


def test_delta_g_variants_differ():
    # core/finDimer adjust both terminal bases; get_multiPrime only the 5'.
    s = "ACGTACGTAC"
    assert exact.delta_g(s, both_ends=True) != exact.delta_g(s, both_ends=False)


def test_penalty_points():
    # Loss of an 18-mer 3'-anchored end is huge in both formulations.
    assert exact.penalty_points(18, 9, 0, 0) > 3
    assert exact.penalty_points_linear(18, 9, 0, 0) > 3


def test_entropy_pair():
    c, t = exact.shannon_pair([2, 2], 4, [], 0)
    assert c == t == 1.0
    c2, t2 = exact.shannon_pair([4], 4, [4], 4)
    assert c2 == -0.0 or c2 == 0.0
    assert t2 == 1.0


def test_gc_fraction():
    assert exact.gc_fraction("GGCC") == 1.0
    assert exact.gc_fraction("AATT") == 0.0
    assert exact.gc_degenerate_mean("SS") == 1.0  # S = G/C


def test_iupac_masks_roundtrip():
    seq = "ACGTRYMKSWHBVDN-"
    assert iupac.masks_to_seq(iupac.seq_to_masks(seq)) == seq


def test_iupac_rc():
    assert iupac.rc("ACGT") == "ACGT"
    assert iupac.rc("AAGG") == "CCTT"
    assert iupac.rc("RY") == "RY"
    assert iupac.rc("N-") == "-N"


def test_expand_order_matches_reference():
    # Member order matters: S expands G before C (core.py:105-107).
    assert iupac.expand("S") == ("G", "C")
    assert iupac.expand("AR") == ("AA", "AG")
    assert iupac.expand("RY") == ("AC", "AT", "GC", "GT")
    assert iupac.expand("A-N") == ("A-A", "A-T", "A-G", "A-C")


def test_mismatch_positions_subset_semantics():
    assert iupac.mismatch_positions("ACGT", "ACGT") == []
    assert iupac.mismatch_positions("RCGT", "ACGT") == []
    assert iupac.mismatch_positions("RCGT", "CCGT") == [0]
    assert iupac.mismatch_positions("NNNN", "ACGT") == []
    assert iupac.mismatch_positions("ACGT", "-CGT") == [0]


def test_degeneracy():
    assert iupac.degeneracy("ACGT") == 1
    assert iupac.degeneracy("RY") == 4
    assert iupac.degeneracy("N") == 4
    assert iupac.num_degenerate_positions("ARYT") == 2


def test_stat_mean_matches_statistics_mean():
    import random
    import statistics
    from multiprime_tpu.thermo import exact
    rng = random.Random(7)
    for _ in range(500):
        n = rng.randint(1, 40)
        vals = [round(rng.uniform(-100, 100), rng.randint(0, 6))
                for _ in range(n)]
        assert exact._stat_mean(vals) == statistics.mean(vals)
    # denormals / extreme exponents
    vals = [5e-324, 1e308, -1e308, 3.3333333333333335]
    assert exact._stat_mean(vals) == statistics.mean(vals)
