"""Primer-pair selection engine (get_multiPrime equivalent).

Re-implements /root/reference/scripts/get_multiPrime.py (class Primers_filter,
:303-662) with identical outputs.  Design differences from the reference:

* The per-pair "uncovered accession union" (reference :560-574 builds Python
  sets from two JSON dicts per pair) is precomputed once per window position
  as a packed boolean bitset over the sequence axis; a pair's coverage is then
  ``N - popcount(F_mask | R_mask)`` — one vector op instead of four set
  unions.  Exact same counts.
* Per-candidate filters (hairpin, GC clamp, 3'-degeneracy, adaptor hairpin)
  are evaluated once per position and cached, not once per pair.

The reference's famously quirky output formats (trailing tabs in the txt row,
``str.rstrip(".txt")`` path surgery for the .xls/.fa siblings) are replicated
so downstream stages and the golden files line up byte-for-byte.
"""

from __future__ import annotations

import os
from bisect import bisect_left
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..thermo import exact as thermo
from ..utils import iupac
from .. import native
from . import mcdpd


@dataclass
class PairingParams:
    """CLI knobs of get_multiPrime.py:50-88.

    Compat quirks replicated from the reference:

    * ``gc`` — the reference CLI parses -g but its main() never forwards it
      (get_multiPrime.py:667-670), so the pre-filter always runs with the
      class default (0.4, 0.6).  Our default matches; pass a different value
      only if you deliberately want the documented (never-used) behaviour.
    * ``weak_hairpin`` — the reference's ``degenerate_seq`` returns a
      *generator* there (get_multiPrime.py:360-372), so its hairpin scan
      exhausts the tail after the first 5'-kmer expansion; only the first
      expansion of each 5-mer is actually tested (:375-386).  True replicates
      that; False runs the full (core-engine) scan.
    """

    size: tuple = (250, 500)       # -s product size range
    gc: tuple = (0.4, 0.6)         # effective pre-filter GC bounds
    fraction: float = 0.6          # -f coverage threshold
    weak_hairpin: bool = True
    end_dege: int = 4              # -e no degenerate base in 3' N bp
    hairpin_distance: int = 4      # -d
    diff_tm: float = 5             # -t (golden run used the class default 5)
    adaptor: tuple = ("TCTTTCCCTACACGACGCTCTTCCGATCT",
                      "TCTTTCCCTACACGACGCTCTTCCGATCT")
    max_seq: int = 0               # -m cap on reference seq count
    nproc: int = 1


def count_ref_seqs(ref_file, max_seq=0):
    """Sequence count = newline count / 2 (get_multiPrime.py:348-357)."""
    n = 0
    with open(ref_file, encoding="utf-8") as f:
        for chunk in iter(lambda: f.read(1 << 20), ""):
            n += chunk.count("\n")
    seq_number = int(n / 2)
    if seq_number > max_seq != 0:
        return max_seq
    return seq_number


def parse_primer_table(path):
    """.top.primer.out -> {position: [primer, F_cov, R_cov, Tm]}"""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("Pos"):
                continue
            parts = line.strip().split("\t")
            out[int(parts[0])] = [parts[3], int(parts[7]), int(parts[8]),
                                  round(float(parts[9]), 2)]
    return out


@lru_cache(maxsize=None)
def _loss_triggers(length, gc, d2):
    """penalty_points(length, gc, 0, d2) > 3.6 — the cross-dimer loss gate
    on a tiny (len, gc, d2) domain, memoized once per tuple."""
    return thermo.penalty_points(length, gc, 0, d2) > 3.6


@lru_cache(maxsize=None)
def _trig_table(l1):
    """uint8 [l1, l1, l1] of the (len, gc, d2) loss-gate verdicts for the
    native hit-end enumeration (built once per primer length)."""
    t = np.zeros((l1, l1, l1), np.uint8)
    for ln in range(5, min(19, l1)):
        for gc in range(ln + 1):
            for d2 in range(l1):
                if _loss_triggers(ln, gc, d2):
                    t[ln, gc, d2] = 1
    return t


@lru_cache(maxsize=1)
def _dg_tables():
    """Python-precomputed double tables for the native dG verdict in
    dimer_hit_ends2: per-step addends fl(ZACH_FREE*ZACH_HBONDS +
    ZACH_PENALTY) (indexed b(e[n+1])*4 + b(e[n]), exactly the order
    thermo.delta_g accumulates), ZACH_INIT by base, TERMINAL_TA, SYMMETRY,
    and the per-length salt term (0.175*ln(0.05)+0.20)*L — every double the
    kernel adds/subtracts is the exact value the Python path uses, so the
    accumulated dg is bit-identical."""
    import math
    from ..thermo import tables as tb
    step = np.zeros(16, np.float64)
    for i in range(4):
        for j in range(4):
            step[i * 4 + j] = (tb.ZACH_FREE_L[i][j] * tb.ZACH_HBONDS_L[i][j]
                               + tb.ZACH_PENALTY_L[i][j])
    init = np.array([tb.ZACH_INIT[c] for c in "ACGT"], np.float64)
    na = 50
    salt = np.array(
        [(0.175 * math.log(na / 1000, math.e) + 0.20) * L
         for L in range(64)], np.float64)
    return (step, init, float(tb.ZACH_TERMINAL_TA),
            float(tb.ZACH_SYMMETRY), salt)


@lru_cache(maxsize=50000)
def _dimer_hit_ends(primer):
    """All 3'-ends that trigger the cross-dimer verdict when searched in
    `primer` (the target side of get_multiPrime.py:419-437, factored out
    of the per-pair loop).

    An end ``e`` hits iff ``rc(e)`` occurs in some expansion ``p`` of the
    primer — at its FIRST occurrence ``idx = p.find(rc(e))``, exactly like
    the reference — with ``loss > 3.6`` or (``dG(e) < -5`` and ``d2 == 0``),
    ``d2 = len(p) - len(e) - idx``.  Enumerating every distinct substring of
    every expansion at its first index (lengths 5..18, the 3'-end length
    range of current_end) yields the complete hit set once per primer;
    GC(e) == GC(rc(e)) so the penalty arguments come straight from the
    substring.

    The substring walk runs natively when available (the result is a SET,
    so only membership matters); the dG verdicts for the d2==0 candidates
    stay in memoised Python.  Fuzz-checked against the pure-Python walk
    below (tests/test_pairing_golden.py)."""
    if len(primer) <= 63:
        full = native.dimer_hit_ends2(primer, _trig_table(len(primer) + 1),
                                      _dg_tables())
        if full is not None:
            return full
        res = native.dimer_hit_ends(primer, _trig_table(len(primer) + 1))
        if res is not None:
            trig, dg_cands = res
            out = set(trig)
            for s in dg_cands:
                e = iupac.rc(s)
                if thermo.delta_g(e, both_ends=False) < -5:
                    out.add(e)
            return frozenset(out)
    return _dimer_hit_ends_py(primer)


def _dimer_hit_ends_py(primer):
    """Pure-Python hit-end walk — the native path's parity oracle."""
    out = set()
    done = set()        # substrings already known to trigger (any expansion)
    for p in iupac.expand(primer):
        n = len(p)
        first = {}
        for start in range(n):
            top = min(18, n - start)
            for ln in range(5, top + 1):
                s = p[start:start + ln]
                if s not in first:
                    first[s] = start
        gcpre = [0] * (n + 1)
        acc = 0
        for i, ch in enumerate(p):
            if ch == "G" or ch == "C":
                acc += 1
            gcpre[i + 1] = acc
        for s, idx in first.items():
            if s in done:
                continue
            ln = len(s)
            d2 = n - ln - idx
            if _loss_triggers(ln, gcpre[idx + ln] - gcpre[idx], d2):
                done.add(s)
                out.add(iupac.rc(s))
            elif d2 == 0:
                e = iupac.rc(s)
                if thermo.delta_g(e, both_ends=False) < -5:
                    done.add(s)
                    out.add(e)
    return frozenset(out)


_PURE_SET = frozenset("ACGT")

_GC_CLAMP_MIN = {}


def _gc_clamp_min_count(k):
    """Minimal integer GC count g with round(g/k, 3) > 0.6 (k+1 if none) —
    the integer form of gc_clamp's rounded-fraction test."""
    v = _GC_CLAMP_MIN.get(k)
    if v is None:
        v = next((g for g in range(k + 1) if round(g / k, 3) > 0.6), k + 1)
        _GC_CLAMP_MIN[k] = v
    return v


class PairingEngine:
    def __init__(self, params: PairingParams):
        self.p = params
        # String-filter machinery shared with the design engine.
        self._helper = mcdpd.DesignEngine(mcdpd.DesignParams(
            hairpin_distance=params.hairpin_distance, algo="v20"))
        # per-instance memo caches: an @lru_cache on the METHOD would key
        # on (engine, primer) in a class-level cache and pin every
        # per-cluster engine (and its primer sets) for the process
        # lifetime; these die with the engine
        self._ends_rc = lru_cache(maxsize=200000)(self._ends_rc)
        self._end_fset = lru_cache(maxsize=200000)(self._end_fset)
        self._self_hit = lru_cache(maxsize=200000)(self._self_hit)

    # -- per-primer filters (get_multiPrime semantics) -------------------------
    def _gc_mean(self, primer):
        return thermo.gc_degenerate_mean_unrounded(primer)

    def gc_clamp(self, primer, num=4, length=13):
        if not (set(primer) - _PURE_SET):
            # pure fast path: suffix GC fractions from one tail walk — for
            # a pure string gc_degenerate_mean_unrounded reduces to
            # round((G+C)/len, 3) of the suffix itself (gc_fraction), with
            # primer[-i:] for i > len being the whole primer.  No suffix
            # substrings, no expansion machinery, no per-suffix caches.
            # Exact-equivalence fuzz: tests/test_pairing_golden.py.
            n = len(primer)
            top = min(n, num + length - 1)
            acc = 0
            tail_gc = [0] * (top + 1)
            for j in range(1, top + 1):
                ch = primer[n - j]
                if ch == "G" or ch == "C":
                    acc += 1
                tail_gc[j] = acc
            for i in range(num, num + length):
                k = i if i <= n else n
                # round(g/k, 3) > 0.6 is monotone in the integer count g:
                # compare against the per-k minimal passing count instead
                # of rounding ~17 floats per call (same verdict)
                if tail_gc[k] >= _gc_clamp_min_count(k):
                    return True
            return False
        for i in range(num, num + length):
            if self._gc_mean(primer[-i:]) > 0.6:
                return True
        return False

    def has_3prime_degenerate(self, primer):
        term = self.p.end_dege
        tail = primer[-term:] if term else "A"
        return iupac.degeneracy(tail) > 1

    def hairpin(self, primer):
        if not self.p.weak_hairpin:
            return self._helper.hairpin_check(primer)
        # Weak variant: only the FIRST expansion of each 5-mer is probed
        # (get_multiPrime.py:360-372 consumes a generator).  rck is then a
        # concrete sequence, so "rck in some tail expansion" is exactly
        # "every rck base intersects the tail mask at some offset" — the
        # same bit-parallel walk as the full check, with first-member masks.
        from .mcdpd import _occ_union, _BASE_OF
        from .. import native
        d = self.p.hairpin_distance
        length = len(primer)
        if length < 10 + d:
            return False
        if not (set(primer) - _PURE_SET):
            first = primer          # pure: the first expansion is itself
        else:
            first = "".join(iupac.CODE_MEMBERS.get(ch, ["A"])[0]
                            for ch in primer)
        flag = native.hairpin_flag(primer, d, first)
        if flag is not None:
            return flag
        prep = _occ_union(primer)
        if prep is None:
            return self._hairpin_weak_ref(primer)
        occ, _ = prep
        first = [iupac.CODE_MEMBERS.get(ch, ["A"])[0] for ch in primer]
        comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
        for n in range(length - 10 - d + 1):
            lo = n + 5 + d
            ok = ((1 << (length - 5 - lo + 1)) - 1) << lo
            for j in range(5):
                ok &= occ[_BASE_OF[comp[first[n + 4 - j]]]] >> j
                if not ok:
                    break
            if ok:
                return True
        return False

    def _hairpin_weak_ref(self, primer):
        d = self.p.hairpin_distance
        n = 0
        while n <= len(primer) - 10 - d:
            k1 = iupac.expand(primer[n:n + 5])[0]
            rck = iupac.rc(k1)
            for tail in iupac.expand(primer[n + 5 + d:]):
                if rck in tail:
                    return True
            n += 1
        return False

    def _ends_rc(self, primer):
        """(end, RC(end)) tuples for a primer's 3'-end set — cached because
        the same primers recur across thousands of pair candidates."""
        if not (set(primer) - _PURE_SET):
            # pure: current_end's expand() of each suffix is the suffix
            # itself, so the end set is just the 5..18-mer suffixes
            # (primer[-i:] for i >= len is the whole primer; dedup keeps
            # the reference's first-seen order)
            ends = [primer[-i:] for i in range(5, 19)]
        else:
            ends = self._helper.current_end(primer)
        return tuple((e, iupac.rc(e)) for e in dict.fromkeys(ends))

    def _end_fset(self, primer):
        """The primer's 3'-end set as a frozenset (order is irrelevant to
        the boolean dimer verdict); derived from _ends_rc so the
        current_end expansion is computed once per primer."""
        return frozenset(e for e, _ in self._ends_rc(primer))

    def dimer_check(self, primer_f, primer_r):
        """F/R cross-dimer (get_multiPrime.py:419-437): Loss > 3.6 with the
        exponential penalty, dG with the single-end initiation variant.

        The reference scans every 3'-end of both primers against both
        primers' expansions per pair — O(ends × expansions) string searches
        × O(pairs).  The verdict is a pure OR over independent (end, target)
        hits, so it factors into per-primer sets computed once:
        ``hit(F,R) = ends(F∪R) ∩ hits(F) ≠ ∅  or  ends(F∪R) ∩ hits(R) ≠ ∅``
        where ``hits(X)`` is the set of ends that trigger when searched in X
        (see _dimer_hit_ends).  Identical verdicts (fuzz-tested against the
        direct scan), ~5x less work per pair."""
        if self._self_hit(primer_f) or self._self_hit(primer_r):
            return True
        ef = self._end_fset(primer_f)
        er = self._end_fset(primer_r)
        return (not ef.isdisjoint(_dimer_hit_ends(primer_r))
                or not er.isdisjoint(_dimer_hit_ends(primer_f)))

    def _self_hit(self, primer):
        """ends(X) ∩ hits(X) ≠ ∅ — the pair-independent half of the
        verdict, cached per primer."""
        return not self._end_fset(primer).isdisjoint(_dimer_hit_ends(primer))

    def _dimer_check_ref(self, primer_f, primer_r):
        """Direct per-pair scan (the reference's formulation) — kept as the
        parity oracle for dimer_check's factored form."""
        seen = dict.fromkeys(self._ends_rc(primer_f))
        seen.update(dict.fromkeys(self._ends_rc(primer_r)))
        ends = list(seen)
        for pp in (primer_f, primer_r):
            expansions = iupac.expand(pp)
            index = self._helper._substring_maxstart(pp, 5)
            for end, rce in ends:
                if rce not in index:
                    continue
                for p in expansions:
                    idx = p.find(rce)
                    if idx >= 0:
                        d2 = len(p) - len(end) - idx
                        loss = thermo.penalty_points(
                            len(end), end.count("G") + end.count("C"), 0, d2)
                        dg = thermo.delta_g(end, both_ends=False)
                        if loss > 3.6 or (dg < -5 and d2 == 0):
                            return True
        return False

    def _pure_gate_tables(self, primers):
        """All-pure fast path for the pair() gates: four native batch
        calls compute, for every primer position, the prefilter flags
        (di/hairpin) + GC count, gc_clamp of primer and of its RC, and
        the adaptor-extended hairpins.  Returns (flags, gc, plen) for the
        prefilter and stashes f_ok/r_ok/r_seq maps on self; None -> the
        per-candidate Python/native path."""
        from .. import native as nat
        self._gate_maps = None
        p = self.p
        positions = list(primers)
        prs = [primers[pos][0] for pos in positions]
        if len(prs) < 16:
            return None                  # batch overhead not worth it
        plen_ = len(prs[0])
        joined = "".join(prs)
        if len(joined) != plen_ * len(prs) or (set(joined) - _PURE_SET):
            return None                  # ragged or degenerate
        ad0, ad1 = str(p.adaptor[0]), str(p.adaptor[1])
        if (set(ad0) | set(ad1)) - _PURE_SET:
            return None
        mat = np.frombuffer(joined.encode(), np.uint8).reshape(-1, plen_)
        num, length = 4, 13              # gc_clamp defaults
        mc = [0] * (num + length)
        for k in range(1, num + length):
            mc[k] = _gc_clamp_min_count(k)
        out = nat.pure_gate_batch(mat, p.hairpin_distance, mc, want=7)
        if out is None:
            return None
        flags, gc = out
        rcs = [iupac.rc(pr) for pr in prs]
        rc_out = nat.pure_gate_batch(
            np.frombuffer("".join(rcs).encode(), np.uint8)
            .reshape(-1, plen_), p.hairpin_distance, mc,
            want=4)                          # gc_clamp(rc) only
        a0_out = nat.pure_gate_batch(
            np.frombuffer("".join(ad0 + pr for pr in prs).encode(),
                          np.uint8).reshape(-1, plen_ + len(ad0)),
            p.hairpin_distance, want=2)      # hairpin only
        a1_out = nat.pure_gate_batch(
            np.frombuffer("".join(ad1 + rc for rc in rcs).encode(),
                          np.uint8).reshape(-1, plen_ + len(ad1)),
            p.hairpin_distance, want=2)
        if rc_out is None or a0_out is None or a1_out is None:
            return None
        f_ok, r_ok, r_seq = {}, {}, {}
        for i, pos in enumerate(positions):
            # pure primers can't carry 3'-degenerate bases; gates reduce
            # to adaptor-hairpin + gc_clamp (bit 2)
            f_ok[pos] = not ((a0_out[0][i] & 2) or (flags[i] & 4))
            r_ok[pos] = not ((a1_out[0][i] & 2) or (rc_out[0][i] & 4))
            r_seq[pos] = rcs[i]
        self._gate_maps = (f_ok, r_ok, r_seq)
        return flags, gc, plen_

    # -- main ------------------------------------------------------------------
    def pair(self, primers, gap_ids, non_cover_ids, number):
        """Enumerate and score primer pairs.

        primers: {pos: [primer, F_cov, R_cov, Tm]}
        gap_ids: {pos: {window: [ids]}}       (gap_seq_id json)
        non_cover_ids: {pos: [{...F...}, {...R...}]} (non_coverage json)
        number: reference sequence count
        Returns list of tuples (F, R, "len:Tm:cov", count, "start:stop").
        """
        p = self.p
        lo_gc, hi_gc = float(p.gc[0]), float(p.gc[1])
        min_len, max_len = int(p.size[0]), int(p.size[1])

        # Pre-filter candidates (get_multiPrime.py:479-497).  When every
        # primer (and both adaptors) is pure ACGT, all per-candidate gates
        # — prefilter hairpin/GC/di plus the f_ok/r_ok adaptor-hairpin and
        # gc_clamp checks — batch into four native calls (for pure rows
        # the weak first-expansion hairpin equals the strong mask scan:
        # the single expansion IS the mask).  Exact-equivalence fuzz:
        # tests/test_pairing_golden.py::test_pure_gate_batch_equivalence.
        batch = self._pure_gate_tables(primers)
        candidates = []
        if batch is not None:
            pflags, pgc, plen_ = batch
            for i, pos in enumerate(primers):
                if pflags[i] & 2:                    # hairpin
                    continue
                gc = float(round(int(pgc[i]) / plen_, 3))
                if gc > hi_gc or gc < lo_gc:
                    continue
                if pflags[i] & 1:                    # di/tri runs
                    continue
                candidates.append(pos)
        else:
            for pos in primers:
                primer = primers[pos][0]
                if self.hairpin(primer):
                    continue
                gc = self._gc_mean(primer)
                if gc > hi_gc or gc < lo_gc:
                    continue
                if self._helper.di_nucleotide(primer):
                    continue
                candidates.append(pos)
        candidates.sort()
        if not candidates:
            return [], candidates
        if candidates[-1] - candidates[0] < min_len:
            return None, candidates     # signals "product can't fit" case

        # Bitset of uncovered accessions per position/side — a Python int
        # with one bit per accession (indices assigned on first sight):
        # the per-pair union+cardinality is then one OR + bit_count()
        # instead of building a set (identical count: the index map is
        # injective, so popcount(a|b) == |set_a U set_b|).
        all_ids = {}
        id_index = {}

        def _id_bits(pos, side):
            key = (pos, side)
            bits = all_ids.get(key)
            if bits is not None:
                return bits
            ids = set()
            g = gap_ids.get(str(pos))
            if g is None:
                g = gap_ids.get(pos, {})
            for v in g.values():
                ids.update(v)
            nc = non_cover_ids.get(str(pos))
            if nc is None:
                nc = non_cover_ids.get(pos)
            for v in nc[side].values():
                ids.update(v)
            bits = 0
            for x in ids:
                b = id_index.get(x)
                if b is None:
                    b = len(id_index)
                    id_index[x] = b
                bits |= 1 << b
            all_ids[key] = bits
            return bits

        # Per-candidate gate caches (batched maps when the pure fast path
        # engaged).
        if batch is not None and self._gate_maps is not None:
            f_ok, r_ok, r_seq = self._gate_maps
        else:
            f_ok, r_ok, r_seq = {}, {}, {}
            for pos in candidates:
                primer = primers[pos][0]
                f_ok[pos] = not (self.hairpin(p.adaptor[0] + primer)
                                 or self.has_3prime_degenerate(primer)
                                 or self.gc_clamp(primer))
                rp = iupac.rc(primer)
                r_seq[pos] = rp
                r_ok[pos] = not (self.hairpin(p.adaptor[1] + rp)
                                 or self.has_3prime_degenerate(rp)
                                 or self.gc_clamp(rp))

        # id-map emptiness: singleton (and other fully-covered gapless)
        # clusters carry NO uncovered/gap accessions at all — the coverage
        # term is then the constants uncovered=0 / covered=number for every
        # pair, so the per-pair bitset work vanishes (the dominant cluster
        # class at the 21k/100k scales is exactly this)
        has_ids = any(gap_ids.values()) if isinstance(gap_ids, dict) else True
        if not has_ids:
            has_ids = any(v[0] or v[1] for v in non_cover_ids.values())

        def enumerate_pairs(threshold, sink, si0=0, si1=None):
            # per-primer dimer state (self-hit, 3'-end set, hit-end set)
            # hoisted out of the pair loop and keyed by CANDIDATE INDEX
            # (list slot, no string hashing): the verdict is two isdisjoint
            # calls per pair
            state_f = [None] * len(candidates)
            state_r = [None] * len(candidates)

            cov_cache = {}      # covered -> "frac" string (str(round(.,4)))
            diff_tm = p.diff_tm
            # candidate-indexed arrays: the r_ok and |dTm| gates (which
            # reject ~90% of visited pairs) evaluate as one vectorised
            # mask per start; the Python loop then touches survivors only.
            # |a-b| is exact and symmetric in IEEE754, so the numpy form
            # rejects exactly the pairs `abs(tm_f - tm_r) > diff_tm` does.
            cand_tm = [primers[c][3] for c in candidates]
            cand_rseq = [r_seq[c] for c in candidates]
            tm_arr = np.asarray(cand_tm, np.float64)
            rok_arr = np.asarray([r_ok[c] for c in candidates], bool)
            append = sink.append
            full_frac = None
            if not has_ids:
                if 0.0 > threshold:      # degenerate fraction > 1 config:
                    return               # every pair fails coverage
                full_frac = str(round(number / number if number else 0.0, 4))
            for i in range(si0, si1 if si1 is not None else len(candidates)):
                start_pos = candidates[i]
                if not f_ok[start_pos]:
                    continue
                left = bisect_left(candidates, start_pos + min_len)
                if start_pos + max_len > candidates[-1]:
                    right = len(candidates) - 1
                else:
                    right = bisect_left(candidates, start_pos + max_len) - 1
                if left > right:
                    continue
                tm_f = primers[start_pos][3]
                # slice bounds imply min_len < distance <= max_len for
                # every j in [left, right] (bisect_left on start+min_len /
                # start+max_len), so the distance re-checks of the scalar
                # loop are provably always-true here
                mask = rok_arr[left:right + 1] \
                    & (np.abs(tm_arr[left:right + 1] - tm_f) <= diff_tm)
                js = (np.nonzero(mask)[0] + left).tolist()
                if not js:
                    continue
                primer_f = primers[start_pos][0]
                f_st = state_f[i]
                if f_st is None:
                    f_st = state_f[i] = (
                        self._self_hit(primer_f), self._end_fset(primer_f),
                        _dimer_hit_ends(primer_f))
                f_self, f_ends, f_hits = f_st
                if f_self:
                    continue     # every pair with this F fails the verdict
                f_bits = _id_bits(start_pos, 0) if has_ids else 0
                avg_cache = {}        # tm_r -> formatted mean (tm_f fixed)
                for j in js:
                    stop_pos = candidates[j]
                    # Gates are independent pure predicates ANDed together;
                    # the reference tests dimer -> Tm -> coverage
                    # (get_multiPrime.py:544-574) but cheapest-first gives
                    # the identical surviving set.
                    tm_r = cand_tm[j]
                    if has_ids:
                        uncovered = (f_bits
                                     | _id_bits(stop_pos, 1)).bit_count()
                        if uncovered / number > threshold:
                            continue
                        covered = number - uncovered
                    else:
                        covered = number
                    primer_r = cand_rseq[j]
                    r_st = state_r[j]
                    if r_st is None:
                        r_st = state_r[j] = (
                            self._self_hit(primer_r),
                            self._end_fset(primer_r),
                            _dimer_hit_ends(primer_r))
                    if r_st[0] \
                            or not f_ends.isdisjoint(r_st[2]) \
                            or not r_st[1].isdisjoint(f_hits):
                        continue
                    avg_tm = avg_cache.get(tm_r)
                    if avg_tm is None:
                        avg_tm = str(round(thermo._stat_mean([tm_f, tm_r]),
                                           2))
                        avg_cache[tm_r] = avg_tm
                    if has_ids:
                        frac = cov_cache.get(covered)
                        if frac is None:
                            frac = str(round(covered / number, 4))
                            cov_cache[covered] = frac
                    else:
                        frac = full_frac
                    append((primer_f, primer_r,
                            "%d:%s:%s" % (stop_pos - start_pos + 1,
                                          avg_tm, frac),
                            covered,
                            "%d:%d" % (start_pos, stop_pos)))

        native_rows = []        # memo: rows are threshold-independent here

        def enumerate_native(threshold, sink):
            """Full-native banded enumeration for the pure no-ids cluster
            class (the dominant one at scale): gates + dimer verdict run in
            one C call over (ln<<40|code) key space; Python only formats
            the survivor rows.  Returns True when it handled the pass.
            Exact-equivalence fuzz vs the Python loop:
            tests/test_pairing_golden.py."""
            if has_ids or batch is None or not candidates:
                return False
            if 0.0 > threshold:
                return True          # degenerate fraction > 1: emit nothing
            if native_rows:
                sink.extend(native_rows[0])
                return True
            from .. import native as nat
            plen_ = len(primers[candidates[0]][0])
            prs_f = [primers[c][0] for c in candidates]
            rcs = [r_seq[c] for c in candidates]
            fmat = np.frombuffer("".join(prs_f).encode(), np.uint8)
            if fmat.size != plen_ * len(candidates):
                return False
            fmat = fmat.reshape(-1, plen_)
            rmat = np.frombuffer("".join(rcs).encode(),
                                 np.uint8).reshape(-1, plen_)
            pos_arr = np.asarray(candidates, np.int64)
            tm_list = [primers[c][3] for c in candidates]
            tm_arr2 = np.asarray(tm_list, np.float64)
            fok_arr = np.asarray([1 if f_ok[c] else 0 for c in candidates],
                                 np.uint8)
            rok_arr2 = np.asarray([1 if r_ok[c] else 0 for c in candidates],
                                  np.uint8)
            res = nat.pure_pair_bands(
                fmat, rmat, pos_arr, tm_arr2, fok_arr, rok_arr2,
                min_len, max_len, p.diff_tm,
                _trig_table(plen_ + 1), _dg_tables(), 0, len(candidates))
            if res is None:
                return False
            idx, avgs = res
            frac = str(round(number / number if number else 0.0, 4))
            rows = []
            append = rows.append
            last_i = -1
            covered = number
            for (i, j), avg_tm in zip(idx.tolist(), avgs):
                if i != last_i:
                    last_i = i
                    primer_f = prs_f[i]
                    start_pos = candidates[i]
                append((primer_f, rcs[j],
                        "%d:%s:%s" % (candidates[j] - start_pos + 1, avg_tm,
                                      frac),
                        covered, "%d:%d" % (start_pos, candidates[j])))
            native_rows.append(rows)
            sink.extend(rows)
            return True

        def run_pass(threshold, sink):
            """One enumeration pass, forked over contiguous start-index
            chunks when nproc > 1.  Chunks concatenate in candidate order,
            so the emission order — and hence the stable coverage sort's
            tie order — is identical to the serial pass.  (The reference's
            own pool is accidentally serial: get_multiPrime.py:621 submits
            the already-computed call result.)"""
            if enumerate_native(threshold, sink):
                return
            # fork+pickle overhead is ~20-40 ms; below ~2k candidates the
            # serial pass wins (measured: golden cluster 0.048 s serial vs
            # 0.068 s forked; test.fa Cluster_0_1 1.64 s vs 1.28 s at 2 cores)
            if p.nproc > 1 and len(candidates) >= 2048 and mcdpd.fork_safe():
                import concurrent.futures as cf
                import multiprocessing as mp
                global _PAIR_FORK
                nw = min(p.nproc, os.cpu_count() or 1)
                bounds = np.linspace(0, len(candidates), nw * 4 + 1,
                                     dtype=int)
                _PAIR_FORK = (enumerate_pairs, threshold)
                try:
                    ctx = mp.get_context("fork")
                    with cf.ProcessPoolExecutor(max_workers=nw,
                                                mp_context=ctx) as pool:
                        for part in pool.map(
                                _call_pair_fork,
                                [(int(a), int(b)) for a, b in
                                 zip(bounds[:-1], bounds[1:]) if a < b]):
                            sink.extend(part)
                finally:
                    _PAIR_FORK = None
            else:
                enumerate_pairs(threshold, sink)

        pairs = []
        threshold = 1 - p.fraction
        run_pass(threshold, pairs)
        if len(pairs) < 10:
            # Relax by 0.1 and re-append (duplicates match the reference's
            # retry behaviour, get_multiPrime.py:629-637).
            run_pass(threshold + 0.1, pairs)
        pairs.sort(key=lambda k: k[3], reverse=True)
        return pairs, candidates


_PAIR_FORK = None


def _call_pair_fork(rng):
    """Run the fork-inherited enumeration closure over one start-index
    range (never pickled: the closure reaches children by fork COW)."""
    enumerate_pairs, threshold = _PAIR_FORK
    out = []
    enumerate_pairs(threshold, out, rng[0], rng[1])
    return out


def parse_degeprime_table(path, number):
    """DEGEPRIME/WRC 8-column output -> {position: [primer, fraction,
    matching]} (get_degePrimer.py:252-264: column 5 = primer, 6 = matches)."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("Pos"):
                continue
            parts = line.strip().split("\t")
            position = int(parts[0])
            matching = int(parts[6])
            out[position] = [parts[5], round(matching / number, 2), matching]
    return out


def pair_degeprime(engine: "PairingEngine", primers):
    """Pair enumeration for the DEGEPRIME backend (get_degePrimer.py
    :462-525): same gates as get_multiPrime but the pair score is
    min(F matches, R matches), there is no Tm/coverage-union filter, and
    the F/R dimer gate is inert (current_end set.union bug, see below)."""
    p = engine.p
    lo_gc, hi_gc = float(p.gc[0]), float(p.gc[1])
    min_len, max_len = int(p.size[0]), int(p.size[1])
    candidates = []
    for pos in primers:
        primer = primers[pos][0]
        if engine.hairpin(primer):
            continue
        gc = engine._gc_mean(primer)
        if gc > hi_gc or gc < lo_gc:
            continue
        if engine._helper.di_nucleotide(primer):
            continue
        if primers[pos][1] < p.fraction:     # coverage gate (:446-447)
            continue
        candidates.append(pos)
    candidates.sort()
    pairs = []
    if not candidates or candidates[-1] - candidates[0] < min_len:
        return pairs, candidates
    for start_pos in candidates:
        primer_f = primers[start_pos][0]
        if engine.hairpin(p.adaptor[0] + primer_f) \
                or engine.has_3prime_degenerate(primer_f) \
                or engine.gc_clamp(primer_f):
            continue
        left = bisect_left(candidates, start_pos + min_len)
        if start_pos + max_len > candidates[-1]:
            right = len(candidates) - 1
        else:
            right = bisect_left(candidates, start_pos + max_len) - 1
        if left > right:
            break       # reference breaks the outer loop here (:483-484)
        for stop_pos in candidates[left:right + 1]:
            primer_r = iupac.rc(primers[stop_pos][0])
            if engine.hairpin(p.adaptor[1] + primer_r) \
                    or engine.has_3prime_degenerate(primer_r) \
                    or engine.gc_clamp(primer_r):
                continue
            distance = stop_pos - start_pos + 1
            if distance > max_len:
                break
            if min_len <= distance <= max_len:
                # reference bug preserved: get_degePrimer.current_end
                # (:320-326) discards set.union's RESULT, so its
                # dimer_check scans an empty end-set and never rejects —
                # the F/R dimer gate is a no-op in this flow
                pairs.append((primer_f, primer_r, distance,
                              min(primers[start_pos][2],
                                  primers[stop_pos][2]),
                              "%d:%d" % (start_pos, stop_pos)))
    pairs.sort(key=lambda k: k[3], reverse=True)
    return pairs, candidates


def write_degeprime_output(pairs, outfile, write_path=None):
    """get_degePrimer.py run()'s exact single-file output (:527-547): the
    abspath as row ID, tab-joined 5-field pairs, trailing tab, one line."""
    outfile = os.path.abspath(outfile)
    with open(write_path or outfile, "w") as fo:
        fo.write(str(outfile) + "\t")
        for row in pairs:
            fo.write("\t".join(map(str, row)) + "\t")
        fo.write("\n")


def write_outputs(pairs, outfile, write_path=None):
    """txt/xls/fa triple with the reference's exact formatting
    (get_multiPrime.py:638-662), including the trailing-tab txt row and the
    rstrip-based sibling paths.

    write_path: actually write the txt there (bytes still label
    ``outfile``) — lets the driver rename the txt into place atomically,
    since its existence is the cluster-done signal for sharded fan-outs."""
    outfile = os.path.abspath(outfile)
    file_id = str(outfile)
    primer_id = str(outfile).split("/")[-1].rstrip(".txt")
    with open(write_path or outfile, "w") as fo, \
            open(outfile.strip(".txt") + ".xls", "w") as fx, \
            open(outfile.strip(".txt") + ".fa", "w") as fa:
        headers = ["Primer_F_seq", "Primer_R_seq",
                   "Product length:Tm:coverage_percentage",
                   "Target number", "Primer_start_end"]
        fx.write("\t".join(headers) + "\n")
        # one join per file (identical bytes; per-row .write calls were
        # ~1/6 of the singleton-cluster pair stage at the 21k scale).
        # %s renders every field exactly like str(), so the single format
        # call per row equals "\t".join(map(str, row)) byte-for-byte.
        cells = ["%s\t%s\t%s\t%s\t%s" % row if len(row) == 5
                 else "\t".join(map(str, row)) for row in pairs]
        fo.write(file_id + "\t")
        if cells:
            fo.write("\t".join(cells) + "\t")
        fx.write("\n".join(cells) + "\n" if cells else "")
        fa_parts = []
        fa_append = fa_parts.append
        for row in pairs:
            start, _, stop = str(row[4]).partition(":")
            fa_append(">" + primer_id + "_" + start + "F\n" + row[0]
                      + "\n>" + primer_id + "_" + stop + "R\n"
                      + row[1] + "\n")
        fa.write("".join(fa_parts))
        fo.write("\n")


def write_empty_output(outfile, write_path=None):
    """The "max product < min len" degenerate case (get_multiPrime.py:610-617)."""
    with open(write_path or outfile, "w") as fo:
        fo.write(str(outfile) + "\n")
