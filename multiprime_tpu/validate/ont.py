"""ONT read primer classification (FindONTprimerV3 equivalent).

Classifies each read's head/tail primer-length k-mer against the expanded
primer set (both strands): best similarity above a threshold assigns the
read end to that primer (FindONTprimerV3.py:126-276).  The reference scores
with difflib.SequenceMatcher.ratio; ``metric="difflib"`` reproduces that
exactly, ``metric="banded"`` uses the banded match-maximising alignment
(2*matches/(len_a+len_b), the same quantity difflib approximates) and is
vectorisable.  Output: per-(F,R) sorted label-pair counts (<out>.num).
"""

from __future__ import annotations

import difflib
import gzip

from ..cluster.greedy import _encode, banded_identity
from ..utils import iupac


def expand_primer_set(primer_fa, expand_fa_out=None):
    """-> {expanded_or_rc_seq: label}; labels '<header> | j' like the
    reference's expand fasta (FindONTprimerV3.py:166-179)."""
    expand = {}
    lines = []
    with open(primer_fa) as f:
        header = None
        for line in f:
            if line.startswith(">"):
                header = line.strip()
            elif line.strip():
                for j, e in enumerate(iupac.expand(line.strip())):
                    label = header + " | " + str(j)
                    lines.append((label, e))
                    expand[e] = label
                    expand[iupac.rc(e)] = label
    if expand_fa_out:
        with open(expand_fa_out, "w") as f:
            for label, e in lines:
                f.write(label + "\n" + e + "\n")
    return expand


def _similarity(a, b, metric):
    if metric == "difflib":
        return round(difflib.SequenceMatcher(None, a, b).ratio(), 2)
    matches = banded_identity(_encode(a), _encode(b), band=8) * min(len(a),
                                                                   len(b))
    return round(2 * matches / (len(a) + len(b)), 2)


def classify_end(seq, expand_dict, min_ident, metric="difflib",
                 report_variant=False):
    """Best-matching primer label for a read end.  With report_variant=True
    the full '<header> | j' expansion label is returned
    (FindONTexpandprimer.py behaviour) instead of the primer name."""
    best_label, best = "NA", -1.0
    for cand, label in expand_dict.items():
        r = _similarity(seq, cand, metric)
        if r > best:
            best = r
            best_label = label if report_variant else label.split(" | ")[0]
    return best_label if best > min_ident else "NA"


def iter_reads(path, fmt="fq"):
    """Yield read lines.  Quirk kept from the reference
    (FindONTprimerV3.py:210-244): gzipped inputs are stripped, plain-text
    inputs are NOT — the tail k-mer of a plain read includes the newline."""
    step = 4 if fmt == "fq" else 2
    if path.endswith("gz"):
        with gzip.open(path, "rt") as f:
            for idx, line in enumerate(f):
                if idx % step == 1:
                    yield line.strip()
    else:
        with open(path) as f:
            for idx, line in enumerate(f):
                if idx % step == 1:
                    yield line


def run(read_file, primer_fa, outfile, primer_len=18, min_ident=0.8,
        fmt="fq", metric="difflib", report_variant=False):
    expand = expand_primer_set(primer_fa,
                               primer_fa.strip("fa") + "expand.fa")
    counts = {}
    for read in iter_reads(read_file, fmt):
        head = read[:primer_len]
        tail = read[-primer_len:]
        pair = sorted([
            classify_end(head, expand, min_ident, metric, report_variant),
            classify_end(tail, expand, min_ident, metric, report_variant)])
        key = "\t".join(pair)
        counts[key] = counts.get(key, 0) + 1
    with open(outfile + ".num", "w") as fo:
        fo.write("Primer_F\tPrimer_R\tNumber\n")
        for key, n in sorted(counts.items(), key=lambda x: x[1],
                             reverse=True):
            fo.write(key + "\t" + str(n) + "\n")
    return counts
