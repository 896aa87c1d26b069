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

Measured verdict (round 1, v5e behind a tunnel): the dense device matrix —
even the single-executable `dimer_hit_matrix_fused` variant — loses to the
inverted-substring-index host scan (validate/findimer.py) at every tested
scale: 3.8 s vs 0.1 s at 2,000 primers, 51 s vs 1.0 s at 8,000 (steady
state, compile amortised).  Dimer hits are sparse; the index does
O(occurrences) work while the dense formulation pays O(targets x ends)
memory traffic plus per-batch device->host transfers.  The host index
stays the production path; this module is kept as the device-native
formulation (verdict-parity-tested) for environments where host CPU is
the scarce resource.
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


def _fused_kernel(t1h, lens, p1h, ln_vec, shift_vec, trig):
    """One uniform-shape pass over ALL end lengths.

    Patterns are left-padded with zero one-hots to a common length Lp
    (zero columns match nothing and add 0 to the correlation, so a count
    equal to the end's true length is still a full match); targets are
    left-padded by Z = Lp - min_len blank positions so every real offset
    stays reachable for every pattern shift.  real_offset = o + shift - Z
    (shift = Lp - len(end)); Z is recoverable as max(shift_vec) because the
    min-length end always exists, keeping the jit signature free of static
    arguments.
    """
    z = jnp.max(shift_vec)
    counts = ms.match_counts_conv(t1h, p1h)               # [T, O, E]
    o = jnp.arange(counts.shape[1], dtype=jnp.int32)[None, :, None]
    real_o = o + shift_vec[None, None, :] - z
    ok = ((counts >= ln_vec[None, None, :])
          & (real_o >= 0)
          & (real_o + ln_vec[None, None, :] <= lens[:, None, None]))
    exists = ok.any(axis=1)                               # [T, E]
    first = jnp.argmax(ok, axis=1)                        # first real offset
    real_first = first + shift_vec[None, :] - z
    d2 = lens[:, None] - ln_vec[None, :] - real_first
    d2 = jnp.clip(d2, 0, trig.shape[1] - 1)
    fired = exists & trig[jnp.arange(trig.shape[0])[None, :], d2]
    return fired


_fused_kernel_jit = jax.jit(_fused_kernel)


def dimer_hit_matrix_fused(primers, threshold=3.96, linear=False, min_len=5,
                           include_full=True, end_max_len=None,
                           t_bucket=1024, e_bucket=4096):
    """dimer_hit_matrix with ONE compiled executable for every length group
    and (via fixed t_bucket/e_bucket padding) for every same-scale primer
    set — the shape-bucketing that amortises tunneled-device compiles.
    Identical verdicts to dimer_hit_matrix / the host scan."""
    p_count = len(primers)
    tgt_exp, tgt_owner = [], []
    for j, pr in enumerate(primers):
        for e in iupac.expand(pr):
            tgt_exp.append(e)
            tgt_owner.append(j)
    tgt_owner = np.array(tgt_owner)
    max_plen = max(len(t) for t in tgt_exp)

    ends, owners, lns, trig_rows = [], [], [], []
    trig_cache = {}
    for i, pr in enumerate(primers):
        seen = set()
        for e in expanded_ends(pr, min_len, end_max_len, include_full):
            if (i, e) in seen:
                continue
            seen.add((i, e))
            ends.append(e)
            owners.append(i)
            lns.append(len(e))
            if e not in trig_cache:
                trig_cache[e] = _trigger_row(e, max_plen, threshold, linear)
            trig_rows.append(trig_cache[e])
    if not ends:
        return np.zeros((p_count, p_count), bool)
    owners = np.array(owners)
    lns = np.array(lns, np.int32)
    lp = int(lns.max())
    lp += -lp % 8                     # coarse grid -> shape reuse across sets
    z = lp - min_len

    # targets: left-pad by Z blanks, one global length (bucketed to 16)
    t_len = z + max_plen
    t_len += -t_len % 16
    t1h_all = np.zeros((len(tgt_exp), t_len, 4), np.float32)
    lens_all = np.zeros(len(tgt_exp), np.int32)
    base = ms.encode_targets(tgt_exp)[0]
    t1h_all[:, z:z + base.shape[1], :] = base
    lens_all[:] = [len(t) for t in tgt_exp]

    # patterns: RC(end), left-padded into [E, Lp, 4]
    e_total = len(ends)
    p1h_all = np.zeros((e_total, lp, 4), np.float32)
    shifts = np.zeros(e_total, np.int32)
    for k, e in enumerate(ends):
        enc = ms.encode_primers([iupac.rc(e)])[0]
        p1h_all[k, lp - len(e):, :] = enc
        shifts[k] = lp - len(e)
    trig = np.stack(trig_rows)                            # [E, plen+1]

    hit = np.zeros((p_count, p_count), bool)
    n_t = len(tgt_exp)
    tb = min(t_bucket, ms.safe_batch_size(
        t_bucket, t_len - lp + 1, e_bucket))
    for elo in range(0, e_total, e_bucket):
        e_sl = slice(elo, min(elo + e_bucket, e_total))
        e_n = e_sl.stop - e_sl.start
        pad_e = -e_n % 512            # coarse grid -> shape reuse across sets
        p1h = np.concatenate(
            [p1h_all[e_sl],
             np.zeros((pad_e,) + p1h_all.shape[1:], np.float32)])
        # padded rows get ln=127 (never reaches a count) and shift=z
        ln_vec = np.concatenate([lns[e_sl],
                                 np.full(pad_e, 127, np.int32)])
        shift_vec = np.concatenate([shifts[e_sl],
                                    np.full(pad_e, z, np.int32)])
        trig_b = np.concatenate(
            [trig[e_sl], np.zeros((pad_e, trig.shape[1]), bool)])
        for tlo in range(0, n_t, tb):
            t_sl = slice(tlo, min(tlo + tb, n_t))
            t_n = t_sl.stop - t_sl.start
            pad_t = -t_n % 256        # coarse grid -> shape reuse across sets
            t1h = np.concatenate(
                [t1h_all[t_sl],
                 np.zeros((pad_t, t_len, 4), np.float32)])
            lens = np.concatenate([lens_all[t_sl],
                                   np.zeros(pad_t, np.int32)])
            fired = np.asarray(_fused_kernel_jit(
                t1h, lens, p1h, ln_vec, shift_vec, trig_b))
            t_idx, e_idx = np.nonzero(fired[:t_n, :e_n])
            if len(t_idx):
                hit[owners[elo + e_idx], tgt_owner[tlo + t_idx]] = True
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
