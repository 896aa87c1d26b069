"""Batched all-vs-all primer-dimer matrix on device.

The reference's finDimer / get_Maxprimerset dimer examinations are O(N^2)
host string searches: every 3'-end suffix of every primer is searched (as a
reverse complement) inside every other primer (finDimer.py:191-224,
get_Maxprimerset.py:193-215).  Here the search runs as exact-match
correlation on the MXU:

1. expand primers and their 3'-end suffixes; group ends by length;
2. for each length group, one mismatch-scan pass (mm=0) of RC(ends) against
   the expanded primer set gives every occurrence with its offset;
3. the Loss / dG verdict depends only on (end, d2) — precomputed per end as
   a trigger table over d2 = len(primer) - len(end) - offset;
4. OR-reduce matches x triggers into a directional boolean matrix
   hit[i, j] = "some 3'-end of primer i dimers inside primer j".

The matrix agrees verdict-for-verdict with the host scans and turns the
greedy solve's per-step examination into table lookups at scale.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..thermo import exact as thermo
from ..utils import iupac
from . import mismatch_scan as ms


def expanded_ends(primer, min_len=5, max_len=None, include_full=True):
    """Expanded 3'-end suffixes with their source lengths.

    finDimer uses suffix lengths 5..(5+14) of the (adaptor+)primer
    (finDimer.py:162-169); get_Maxprimerset uses 5..len-1
    (get_Maxprimerset.py:149-154) — pick via include_full/max_len.
    """
    out = []
    top = len(primer) if include_full else len(primer) - 1
    if max_len is not None:
        top = min(top, max_len)
    for ln in range(min_len, top + 1):
        for e in iupac.expand(primer[-ln:]):
            out.append(e)
    return out


def _trigger_row(end, plen, threshold, linear):
    """Boolean over d2 in [0, plen]: does a hit of `end` at distance d2
    trigger the dimer verdict?"""
    gc = end.count("G") + end.count("C")
    dg = thermo.delta_g(end, both_ends=True)
    row = np.zeros(plen + 1, bool)
    for d2 in range(plen + 1):
        if linear:
            loss = thermo.penalty_points_linear(len(end), gc, 0, d2)
        else:
            loss = thermo.penalty_points(len(end), gc, 0, d2)
        row[d2] = loss >= threshold or (dg < -5 and d2 == 0)
    return row


def dimer_hit_matrix(primers, threshold=3.96, linear=False, min_len=5,
                     include_full=True, end_max_len=None, batch_patterns=512):
    """-> bool [P, P]: hit[i, j] = some 3'-end of primers[i] dimer-hits
    primers[j] (directional, includes i == j)."""
    p_count = len(primers)
    # expanded target set
    tgt_exp = []
    tgt_owner = []
    for j, pr in enumerate(primers):
        for e in iupac.expand(pr):
            tgt_exp.append(e)
            tgt_owner.append(j)
    tgt_owner = np.array(tgt_owner)
    max_plen = max(len(t) for t in tgt_exp)
    t1h, lengths = ms.encode_targets(tgt_exp)

    # expanded ends grouped by length
    ends_by_len = {}
    for i, pr in enumerate(primers):
        seen = set()
        for e in expanded_ends(pr, min_len, end_max_len, include_full):
            if (i, e) in seen:
                continue
            seen.add((i, e))
            ends_by_len.setdefault(len(e), []).append((i, e))

    hit = np.zeros((p_count, p_count), bool)
    for ln, pairs in sorted(ends_by_len.items()):
        if ln > max_plen:
            continue
        owners = np.array([i for i, _ in pairs])
        patterns = [iupac.rc(e) for _, e in pairs]
        triggers = np.stack([_trigger_row(e, max_plen, threshold, linear)
                             for _, e in pairs])          # [E, plen+1]
        n_out = t1h.shape[1] - ln + 1
        for lo in range(0, len(patterns), batch_patterns):
            chunk = patterns[lo:lo + batch_patterns]
            p1h = ms.encode_primers(chunk)
            counts = np.asarray(ms.match_counts_conv(t1h, p1h))
            full = counts >= ln                            # [T, O, E]
            # valid window inside each target
            valid = (np.arange(n_out)[None, :] + ln) <= lengths[:, None]
            full &= valid[:, :, None]
            # the reference evaluates only str.find's FIRST occurrence
            # (finDimer.py:198-207); replicate via argmax over the offset.
            exists = full.any(axis=1)                      # [T, E]
            first_o = np.argmax(full, axis=1)              # [T, E]
            d2 = lengths[:, None] - ln - first_o
            d2 = np.clip(d2, 0, triggers.shape[1] - 1)
            chunk_trig = triggers[lo:lo + batch_patterns]  # [E, plen+1]
            fired = exists & chunk_trig[
                np.arange(chunk_trig.shape[0])[None, :], d2]
            t_idx, e_idx = np.nonzero(fired)
            if len(t_idx):
                hit[owners[lo + e_idx], tgt_owner[t_idx]] = True
    return hit


def verify_against_host(primers, threshold=3.96, linear=False):
    """Cross-check helper: host finDimer-style directional verdicts."""
    out = np.zeros((len(primers), len(primers)), bool)
    for i, pr in enumerate(primers):
        ends = expanded_ends(pr)
        for j, other in enumerate(primers):
            found = False
            for e in ends:
                rce = iupac.rc(e)
                for pexp in iupac.expand(other):
                    idx = pexp.find(rce)
                    if idx >= 0:
                        d2 = len(pexp) - len(e) - idx
                        if linear:
                            loss = thermo.penalty_points_linear(
                                len(e), e.count("G") + e.count("C"), 0, d2)
                        else:
                            loss = thermo.penalty_points(
                                len(e), e.count("G") + e.count("C"), 0, d2)
                        dg = thermo.delta_g(e, both_ends=True)
                        if loss >= threshold or (dg < -5 and d2 == 0):
                            found = True
                            break
                if found:
                    break
            out[i, j] = found
    return out
