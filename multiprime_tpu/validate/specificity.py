"""Primer specificity vs a background database (primer_specificity.py
equivalent).

Same engine as the coverage validation scan but pointed at an off-target
background (primer_specificity.py:211-440 runs bowtie with looser seeds);
here the exhaustive scan IS the looser search — every site with <= mm
mismatches is reported, so bowtie's heuristic misses cannot occur.  Rows
hitting the background are specificity violations.
"""

from __future__ import annotations

from . import scan as vscan


def run(primer_fa, background_fa, outfile, mm=2, term=0,
        product_size=(50, 2000), batch_seqs=256):
    """Scan primers against a background DB; any F/R join inside an
    amplifiable window is a predicted off-target amplicon."""
    params = vscan.ScanParams(term_len=0, term=term, mm=mm,
                              product_size=product_size,
                              batch_seqs=batch_seqs)
    rows = vscan.run(primer_fa, background_fa, outfile, params)
    return rows
