"""All-vs-all primer-dimer scan of a final set (finDimer equivalent).

Re-implements /root/reference/scripts/finDimer.py (class Dimer:127-280):
for each primer (by file order), its expanded 3'-ends (suffix lengths 5..18,
adaptor-extendable) are searched as reverse complements inside every primer at
or after it in the list; the first hit per (primer, other) pair is reported
with its Loss / dG verdict.

The reference's pool submits per-primer tasks whose result order is
non-deterministic at nproc>1; we run positions in ascending order, which is
identical to its nproc=1 behaviour.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..thermo import exact as thermo
from ..utils import iupac


@dataclass
class FinDimerParams:
    threshold: float = 3.96     # -t Loss threshold
    adaptor: str = ""
    nproc: int = 1


def parse_primer_fasta(path):
    """fasta -> {sequence: name} (finDimer.py:138-146; later names win when
    sequences repeat, replicated by plain dict assignment)."""
    primers = {}
    name = None
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                name = line.strip()
            else:
                primers[line.strip()] = name
    return primers


def current_end(primer, adaptor="", num=5, length=14):
    """Expanded 3'-end suffixes (finDimer.py:162-169)."""
    ext = adaptor + primer
    out = []
    for i in range(num, num + length):
        s = ext[-i:]
        if s:
            out.extend(iupac.expand(s))
    return out


def scan(primers, threshold=3.96, adaptor=""):
    """Yield dimer hit rows in the reference's sequential order."""
    seqs = list(primers.keys())
    rows = []
    for pos, primer in enumerate(seqs):
        ends = sorted(current_end(primer, adaptor), key=len, reverse=True)
        for other in seqs[pos:]:
            expansions = iupac.expand(other)
            hit = None
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
                            hit = (primers[primer], primer, end, dg,
                                   len(end), 0, end.count("G") + end.count("C"),
                                   primers[other], other, d2, loss)
                            break
                if hit:
                    break
            if hit:
                rows.append(hit)
    return rows


HEADERS = ["Primer_ID", "Primer seq", "Primer end", "Delta G",
           "Primer end length", "End (distance 1)", "End (GC)",
           "Dimer-primer_ID", "Dimer-primer seq", "End (distance 2)", "Loss"]


def write_outputs(rows, outfile):
    """Main table + .dimer_num row-sum summary (finDimer.py:250-280)."""
    id_sum = {}
    dimer_sum = {}
    with open(outfile, "w") as fo:
        fo.write("\t".join(HEADERS) + "\n")
        for row in rows:
            id_sum[row[0]] = id_sum.get(row[0], 0) + 1
            dimer_sum[row[7]] = dimer_sum.get(row[7], 0) + 1
            fo.write("\t".join(map(str, row)) + "\n")
    with open(outfile + ".dimer_num", "w") as fo:
        fo.write("SeqName\tPrimer_ID\tDimer-primer_ID\tRowSum\n")
        for k in id_sum:
            p_id = id_sum[k]
            d_id = dimer_sum.get(k, 0)
            fo.write("\t".join(map(str, [k, p_id, d_id, p_id + d_id])) + "\n")
