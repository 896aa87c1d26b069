"""Iterative profile-based MSA refinement (MAFFT/MUSCLE polish analogue).

The reference gets column quality from ``mafft --auto``'s progressive +
iterative refinement (run_mafft.py:66-72).  Our center-star construction
(`centerstar.py`) only ever aligns members to the chosen center, so members
agree with the center but not necessarily with each other.  This module adds
the classic refinement step: re-align every member to the *profile* of the
current alignment (excluding itself), accept the new alignment if overall
column agreement improves, iterate.

Design notes (why it looks the way it does):

* The column space is FIXED per pass: a member row of length C re-chooses
  which of the C columns hold its residues.  Insertions never need new
  columns — the existing row already has a column for every residue — so the
  DP is "place L residues into C columns in order", a two-state (place/skip)
  Gotoh with position-specific, occupancy-weighted gap costs: skipping a
  column where most rows have gaps is nearly free, skipping a well-occupied
  column costs a real gap.  This is the position-specific gap penalty trick
  progressive aligners use.
* End skips are free (semi-global): terminal gap runs in an MSA row carry
  no signal.
* All members of a chunk run in ONE vectorised column loop ([M, L+1] state
  arrays), the same schedule as `centerstar.align_ops_batch`.
* A pass is accepted only if the agreement score Q = sum_c sum_b n_b(c)^2
  strictly increases (n_b = count of base b in column c).  Q is the
  pair-count potential: sum_b C(n_b,2) up to constants, so it rises exactly
  when more same-base pairs share a column.  Accept-if-better makes the
  iteration monotone and self-terminating.
"""

from __future__ import annotations

import numpy as np

GAP_OPEN = -4.0     # opening cost, scaled by column occupancy
GAP_EXT = -1.0      # per-column skip cost, scaled by column occupancy
NEG = np.float32(-1e30)

_BASE_IDX = {65: 0, 67: 1, 71: 2, 84: 3}   # A C G T
_GAP = 4
_OTHER = 5


def encode_rows(rows):
    """Aligned rows -> codes [M, C] (0..3 base, 4 gap, 5 other)."""
    mat = np.frombuffer("".join(rows).encode("ascii"), np.uint8)
    mat = mat.reshape(len(rows), -1)
    out = np.full(mat.shape, _OTHER, np.int8)
    out[mat == 45] = _GAP                      # '-'
    for b, v in _BASE_IDX.items():
        out[mat == b] = v
    return out


def agreement_score(codes):
    """Q = sum over columns of sum_b count_b^2 (bases only)."""
    q = 0
    counts = _column_counts(codes)
    q = int((counts[:, :4].astype(np.int64) ** 2).sum())
    return q


def _column_counts(codes):
    """[C, 6] per-column counts of codes 0..5."""
    m, c = codes.shape
    counts = np.zeros((c, 6), np.int32)
    for v in range(6):
        counts[:, v] = (codes == v).sum(axis=0)
    return counts


def _realign_chunk(res_chars, res_codes, lens, f6, occ):
    """Place each member's residues back into the C columns.

    res_chars: list of residue byte-strings (len M)
    res_codes: [M, Lmax] residue codes (0..3, or 5 for other), padded
    lens:      [M] residue counts
    f6:        [M, C, 6] per-member base frequencies (self excluded; columns
               4/5 are zero so code-4/5 gathers score as total mismatch)
    occ:       [M, C] per-member column occupancy (self excluded)
    -> list of new row byte-strings, all length C.
    """
    mc, c = occ.shape
    lmax = res_codes.shape[1]
    iar = np.arange(lmax + 1)
    active = iar[None, :] <= lens[:, None]          # valid residue prefixes
    v_prev = np.full((mc, lmax + 1), NEG, np.float32)
    v_prev[:, 0] = 0.0                              # free leading skips
    g_prev = np.full((mc, lmax + 1), NEG, np.float32)
    # bit0: V took the skip state; bit1: skip run continues leftwards
    ptr = np.zeros((c + 1, mc, lmax + 1), np.uint8)
    best_v = np.full(mc, NEG, np.float32)
    best_j = np.zeros(mc, np.int64)
    for j in range(1, c + 1):
        occ_j = occ[:, j - 1][:, None]
        s_col = 2.0 * (2.0 * np.take_along_axis(
            f6[:, j - 1, :], res_codes.astype(np.int64), axis=1)
            - occ_j).astype(np.float32)             # [mc, lmax]
        open_cand = v_prev + GAP_OPEN * occ_j
        gcont = g_prev >= open_cand
        g_cur = np.maximum(g_prev, open_cand) + GAP_EXT * occ_j
        diag = np.full((mc, lmax + 1), NEG, np.float32)
        diag[:, 1:] = v_prev[:, :-1] + s_col
        take_skip = g_cur > diag
        v_cur = np.where(take_skip, g_cur, diag)
        v_cur[:, 0] = 0.0
        v_cur = np.where(active, v_cur, NEG)
        g_cur = np.where(active, g_cur, NEG)
        ptr[j] = take_skip.astype(np.uint8) | (gcont.astype(np.uint8) << 1)
        v_end = v_cur[np.arange(mc), lens]
        upd = v_end > best_v
        best_v = np.where(upd, v_end, best_v)
        best_j = np.where(upd, j, best_j)
        v_prev, g_prev = v_cur, g_cur
    rows = []
    for m in range(mc):
        out = bytearray(b"-" * c)
        i, j = int(lens[m]), int(best_j[m])
        chars = res_chars[m]
        state_skip = False
        while i > 0:
            p = ptr[j, m, i]
            if j <= i:                       # only diagonal moves remain
                state_skip = False
                take = False
            elif state_skip:
                take = True
            else:
                take = bool(p & 1)
            if take:
                state_skip = bool(p & 2)
                j -= 1
            else:
                out[j - 1] = chars[i - 1]
                i -= 1
                j -= 1
                state_skip = False
        rows.append(bytes(out))
    return rows


def refine_pass(rows, chunk_bytes=1 << 30, backend="auto"):
    """One profile-realignment pass over every member.  Returns new rows
    (same residues per row, possibly shifted between columns).

    backend: "auto" prefers the native threaded DP (seqlib.refine_realign,
    identical float32 op order), falling back to the vectorised NumPy path.
    """
    m = len(rows)
    if m < 2:
        return list(rows)
    codes = encode_rows(rows)
    c = codes.shape[1]
    int_counts = _column_counts(codes)
    # "auto" prefers the native threaded DP: it is bit-identical to both
    # other paths and avoids the device path's per-pass host<->device
    # transfer of the full [m, C, 6] profile tensors, which dominates on
    # tunneled/remote links (measured 1.9 s native vs 93 s device for the
    # 500x1894 golden cluster).  "device" stays as an explicit opt-in for
    # locally-attached chips with the MSA already resident.
    if backend == "device":
        return _refine_pass_device(rows, codes, int_counts)
    if backend in ("auto", "native"):
        from .. import native
        raw = native.refine_realign("".join(rows).encode("ascii"), codes,
                                    int_counts, GAP_OPEN, GAP_EXT)
        if raw is not None:
            return [raw[i * c:(i + 1) * c].decode("ascii") for i in range(m)]
        if backend == "native":
            raise RuntimeError("native seqlib unavailable")
    counts = int_counts.astype(np.float32)                 # [C, 6]
    denom = max(m - 1, 1)
    # residues per member
    res_chars, res_code_list = [], []
    for mi in range(m):
        mask = codes[mi] != _GAP
        res_chars.append(rows[mi].replace("-", "").encode("ascii"))
        res_code_list.append(codes[mi][mask])
    lens = np.array([len(r) for r in res_code_list])
    lmax = int(lens.max())
    res_codes = np.full((m, lmax), _OTHER, np.int8)
    for mi, rc in enumerate(res_code_list):
        res_codes[mi, :len(rc)] = rc
    chunk = max(1, int(chunk_bytes // max((c + 1) * (lmax + 1), 1)))
    new_rows = []
    onehot = np.eye(6, dtype=np.float32)
    for lo in range(0, m, chunk):
        sel = slice(lo, min(lo + chunk, m))
        mc = sel.stop - sel.start
        self_oh = onehot[codes[sel].astype(np.int64)]      # [mc, C, 6]
        cnt_ex = counts[None, :, :] - self_oh
        f6 = cnt_ex / denom
        f6[:, :, 4:] = 0.0
        occ = 1.0 - cnt_ex[:, :, 4] / denom
        out = _realign_chunk([res_chars[i] for i in range(m)[sel]],
                             res_codes[sel], lens[sel], f6, occ)
        new_rows.extend(r.decode("ascii") for r in out)
    return new_rows


def _refine_pass_device(rows, codes, int_counts):
    """One pass on device (align/device.refine_pass_device); identical f32
    rounding to the NumPy chunk DP (all multiplies pre-scaled on host)."""
    from .device import refine_pass_device

    m, c = codes.shape
    counts = int_counts.astype(np.float32)
    denom = max(m - 1, 1)
    # Vectorised residue compaction: scatter non-gap chars/codes left.
    arr = np.frombuffer("".join(rows).encode("ascii"),
                        np.uint8).reshape(m, c)
    mask = codes != _GAP
    lens = mask.sum(axis=1)
    lmax = int(lens.max())
    pos = np.cumsum(mask, axis=1, dtype=np.int64) - 1
    rr, cc = np.nonzero(mask)
    chars_mat = np.zeros((m, lmax), np.uint8)
    chars_mat[rr, pos[rr, cc]] = arr[rr, cc]
    res_codes = np.full((m, lmax), _OTHER, np.int8)
    res_codes[rr, pos[rr, cc]] = codes[rr, cc]
    blob = chars_mat.tobytes()
    res_chars = [blob[mi * lmax:mi * lmax + lens[mi]] for mi in range(m)]
    onehot = np.eye(6, dtype=np.float32)
    self_oh = onehot[codes.astype(np.int64)]          # [m, C, 6]
    cnt_ex = counts[None, :, :] - self_oh
    f6 = cnt_ex / denom
    f6[:, :, 4:] = 0.0
    occ = 1.0 - cnt_ex[:, :, 4] / denom
    out = refine_pass_device(res_chars, res_codes.astype(np.int32),
                             lens.astype(np.int32), f6, occ, c,
                             go=GAP_OPEN, ge=GAP_EXT)
    return [r.decode("ascii") for r in out]


def drop_gap_columns(rows):
    if not rows:
        return rows
    codes = encode_rows(rows)
    keep = (codes != _GAP).any(axis=0)
    if keep.all():
        return rows
    idx = np.flatnonzero(keep)
    mat = np.frombuffer("".join(rows).encode("ascii"),
                        np.uint8).reshape(len(rows), -1)
    mat = mat[:, idx]
    return [bytes(r).decode("ascii") for r in mat]


def refine_msa(rows, iterations=2, chunk_bytes=1 << 30):
    """Iteratively polish an MSA; each pass is kept only if the column
    agreement score improves.  Row order and residue content are preserved;
    all-gap columns are dropped."""
    if len(rows) < 2 or iterations <= 0:
        return list(rows)
    cur = drop_gap_columns(list(rows))
    cur_q = agreement_score(encode_rows(cur))
    for _ in range(iterations):
        cand = drop_gap_columns(refine_pass(cur, chunk_bytes))
        q = agreement_score(encode_rows(cand))
        if q <= cur_q:
            break
        cur, cur_q = cand, q
    return cur
