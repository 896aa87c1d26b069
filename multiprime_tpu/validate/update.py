"""Incremental primer-set maintenance (Primer_set_update equivalent).

The reference's Primer_set_update.py:247-507 checks NEW candidate primers
against an existing core set: (a) cross-dimer scan of new x (new + core)
with the finDimer engine, (b) off-target / PCR prediction of the merged set
against a reference DB via bowtie — here the exhaustive device scan.

``func="DO"`` (the reference's flag) runs both; "dimer" / "offtarget" run a
single half.
"""

from __future__ import annotations

from . import findimer
from . import scan as vscan


def check_new_primers(new_fa, core_fa, outfile, threshold=3.96):
    """Cross-dimer report rows for every new primer vs (new + core) set."""
    new = findimer.parse_primer_fasta(new_fa)
    core = findimer.parse_primer_fasta(core_fa)
    merged = {}
    merged.update(core)
    merged.update(new)
    rows = []
    seqs = list(merged.keys())
    new_seqs = set(new.keys())
    for primer in seqs:
        if primer not in new_seqs:
            continue
        ends = sorted(findimer.current_end(primer), key=len, reverse=True)
        for other in seqs:
            hit = None
            from ..utils import iupac
            from ..thermo import exact as thermo
            expansions = iupac.expand(other)
            for end in ends:
                rce = iupac.rc(end)
                for p in expansions:
                    idx = p.find(rce)
                    if idx >= 0:
                        d2 = len(p) - len(end) - idx
                        loss = thermo.penalty_points(
                            len(end), end.count("G") + end.count("C"), 0, d2)
                        dg = thermo.delta_g(end, both_ends=True)
                        if loss >= threshold or (dg < -5 and d2 == 0):
                            hit = (merged[primer], primer, end, dg, len(end),
                                   0, end.count("G") + end.count("C"),
                                   merged[other], other, d2, loss)
                            break
                if hit:
                    break
            if hit:
                rows.append(hit)
    findimer.write_outputs(rows, outfile)
    return rows


def predict_merged_set(new_fa, core_fa, ref_fa, outfile,
                       params: vscan.ScanParams = None, targets_dict=None):
    """Off-target / coverage prediction of the merged primer set."""
    params = params or vscan.ScanParams()
    merged_fa = outfile + ".merged.fa"
    with open(merged_fa, "w") as out:
        for path in (core_fa, new_fa):
            out.write(open(path).read())
    return vscan.run(merged_fa, ref_fa, outfile, params, targets_dict)


def run(new_fa, core_fa, ref_fa, out_prefix, func="DO",
        scan_params: vscan.ScanParams = None):
    results = {}
    if func in ("DO", "dimer"):
        results["dimer"] = check_new_primers(
            new_fa, core_fa, out_prefix + ".update.dimer")
    if func in ("DO", "offtarget") and ref_fa:
        results["offtarget"] = predict_merged_set(
            new_fa, core_fa, ref_fa, out_prefix + ".update.out", scan_params)
    return results


def select_nondimer(new_fa, pool_fa, out_fa, threshold=3.96):
    """primer_filter.sh / select.nondimer.primer.sh equivalent: keep the new
    primers that form NO dimer against the pooled set (the shell helpers
    run finDimer/Primer_set_update over the merged fasta, join against the
    candidate fasta, and keep records with no dimer row).

    -> list of kept primer names (without '>').
    """
    import os
    rows = check_new_primers(new_fa, pool_fa,
                             out_fa + ".dimer.tmp", threshold=threshold)
    try:
        os.remove(out_fa + ".dimer.tmp")
        os.remove(out_fa + ".dimer.tmp.dimer_num")
    except OSError:
        pass
    involved = {r[1] for r in rows}
    new = findimer.parse_primer_fasta(new_fa)
    kept = []
    with open(out_fa, "w") as f:
        for primer, name in new.items():
            if primer in involved:
                continue
            f.write(">%s\n%s\n" % (name.lstrip(">"), primer))
            kept.append(name.lstrip(">"))
    return kept
