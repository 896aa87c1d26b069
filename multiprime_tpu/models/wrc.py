"""DEGEPRIME-style Weighted Randomised Combination backend (MC-DPD).

The multi-DegePrime pipeline (multi-DegePrime.py:154-197) trims sparse MSA
columns (TrimAlignment.pl) then, per window, runs DegePrime.pl's WRC search
(DegePrime.pl:253-340): repeatedly draw window variants ("mers") with
probability proportional to their counts, union their bases per position,
keep the union while its degeneracy stays within max_deg, and report the
best-matching combination over N randomised iterations.

The search is embarrassingly parallel over (windows x iterations); here all
iterations of a window run as one vectorised batch (the draws are
count-weighted categorical samples), seeded for reproducibility —
the Perl original is unseeded and not even self-reproducible.
"""

from __future__ import annotations

import numpy as np

from ..utils import iupac


def trim_alignment(rows, min_occupancy=0.1):
    """Remove columns whose non-gap fraction is below min_occupancy
    (TrimAlignment.pl behaviour).  rows: list of aligned strings.
    -> (trimmed rows, kept column indices)."""
    mat = np.array([list(r) for r in rows])
    occ = (mat != "-").mean(axis=0)
    keep = np.nonzero(occ >= min_occupancy)[0]
    trimmed = ["".join(r) for r in mat[:, keep]]
    return trimmed, keep


def wrc_window(mers, counts, max_deg=96, iterations=100, seed=0):
    """Best degenerate primer for one window's variant list.

    mers: list of equal-length ACGT strings; counts: occurrence counts.
    -> (degenerate primer, matching count)
    """
    if not mers:
        return "", 0
    plen = len(mers[0])
    k = len(mers)
    masks = np.stack([iupac.seq_to_masks(m) for m in mers])    # [K, plen]
    counts = np.asarray(counts, np.int64)
    rng = np.random.default_rng(seed)
    probs = counts / counts.sum()
    best_match, best_mask = 0, None
    draws_per_iter = min(k, max(8, int(np.log2(max_deg)) * plen))
    # batched draws for every iteration at once
    all_draws = rng.choice(k, size=(iterations, draws_per_iter), p=probs)
    for it in range(iterations):
        union = np.zeros(plen, np.uint8)
        chosen = set()
        matching = 0
        for idx in all_draws[it]:
            if idx in chosen:
                continue
            cand = union | masks[idx]
            deg = np.prod(np.maximum(
                iupac.popcount4(cand).astype(np.int64), 1))
            if deg <= max_deg:
                union = cand
                chosen.add(int(idx))
                # matching = all mers whose mask is a subset of the union
        member = ((masks & ~union[None, :]) == 0).all(axis=1)
        matching = int(counts[member].sum())
        if matching > best_match:
            best_match = matching
            best_mask = union
    if best_mask is None:
        best_mask = masks[int(np.argmax(counts))]
        best_match = int(counts[np.argmax(counts)])
    primer = "".join(iupac.MASK_TO_CHAR[int(m)] if m else "-"
                     for m in best_mask)
    return primer, best_match


def design_windows(rows, plen=18, max_deg=96, iterations=100, seed=0,
                   max_gap_frac=0.1):
    """DegePrime over every window of a (trimmed) alignment.

    -> list of (position, primer, matching, total) rows like DegePrime's
    table output."""
    mat = np.array([list(r) for r in rows])
    n, length = mat.shape
    out = []
    for pos in range(0, length - plen + 1):
        win = mat[:, pos:pos + plen]
        gap_ok = (win == "-").sum(axis=1) == 0
        if gap_ok.sum() < (1 - max_gap_frac) * n:
            continue
        strings = ["".join(w) for w in win[gap_ok]]
        uniq, counts = np.unique(strings, return_counts=True)
        primer, matching = wrc_window(list(uniq), counts, max_deg,
                                      iterations, seed + pos)
        out.append((pos, primer, matching, int(gap_ok.sum())))
    return out
