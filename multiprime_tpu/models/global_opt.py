"""multiPrime2 "global optimum" degenerate refinement (v2 backend).

Implements the v2 algorithm of multiPrime2_onstep.py:1156-1270 /
multiPrime2-core_V2.py: instead of the greedy NN-link walk, collect the
mismatch (position, base) elements of every uncovered window variant versus
the consensus, then search (position,base)-combinations of size
<= dege_number-1 that maximise the number of variants left with <= variation
residual mismatches.  The chosen elements are merged into the consensus as
IUPAC codes.

Quirks replicated from the reference:
* ``Y_dist_len_collection`` dedup tests a list against dict *values* (lists
  of lists) — never true, so duplicate mismatch patterns are appended and
  counted repeatedly in the combination score (:1225-1232).
* the element pool only includes patterns with 1 < len < degenerate_number +
  variation, and the search returns early with (max_count, comb) the moment
  a combination covers everything (:1240-1270).
"""

from __future__ import annotations

import itertools

import numpy as np

from ..utils import iupac


def mismatch_elements(primer, target):
    """["pos|BASE", ...] for every position where target's base is not in
    the primer's code (Y_position, multiPrime2_onstep.py:248-252)."""
    pm = iupac.seq_to_masks(primer)
    tm = iupac.seq_to_masks(target)
    covered = (tm != 0) & ((pm & tm) == tm)
    out = []
    for idx in np.nonzero(~covered)[0]:
        ch = target[idx]
        out.append(str(int(idx)) + "|" + ch)
    return out


def merge_elements(primer, elements):
    """Add each element's base into the primer code (degenerate_merge,
    multiPrime2_onstep.py:516-523)."""
    chars = list(primer)
    for el in elements:
        pos, base = el.split("|")
        pos = int(pos)
        if base not in iupac.CODE_MEMBERS.get(chars[pos], [chars[pos]]):
            chars[pos] = iupac.union_char([chars[pos], base])
    return "".join(chars)


def refine_global(primer, cover, dege_number, variation, cover_number):
    """-> (degenerate_primer, coverage) via the v2 combination search."""
    optimal_set = set(iupac.expand(primer))
    dist_number = {}
    dist_by_len = {}
    for key in cover.keys():
        if key in optimal_set:
            continue
        dist = mismatch_elements(primer, key)
        joined = "_".join(dist)
        dist_number[joined] = dist_number.get(joined, 0) + 1
        # reference bug preserved: the membership test never fires, every
        # pattern (duplicates included) is appended
        dist_by_len.setdefault(len(dist), []).append(dist)
    coverage, chosen = _search_combinations(
        dist_number, dist_by_len, dege_number, variation, cover_number)
    return merge_elements(primer, chosen), coverage


def _search_combinations(dist_number, dist_by_len, n, variation,
                         cover_number):
    """remove_elements (multiPrime2_onstep.py:1240-1270)."""
    max_count = 0
    max_subset = ()
    for degenerate_number in range(2, n + 1):
        pool = []
        elements = set()
        for length, dists in dist_by_len.items():
            if 1 < length < degenerate_number + variation:
                pool.extend(dists)
                for d in dists:
                    elements |= set(d)
        if len(elements) > degenerate_number:
            for comb in itertools.combinations(elements,
                                               degenerate_number - 1):
                comb_set = set(comb)
                count = 0
                for dist in pool:
                    if len(set(dist) - comb_set) <= variation:
                        count += dist_number["_".join(dist)]
                        if count == cover_number:
                            return max_count, comb
                if count > max_count:
                    max_count = count
                    max_subset = comb
        else:
            max_count = cover_number
            max_subset = tuple(elements)
    return max_count, max_subset
