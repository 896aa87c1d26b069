"""Center-star multiple alignment (MAFFT/MUSCLE replacement).

The reference shells out to ``mafft --auto`` (or muscle for singleton
clusters, run_mafft.py:66-72) purely to build the per-cluster MSA that the
window-design engine consumes.  This module provides a TPU-era stand-in:

* center selection by maximum summed k-mer similarity;
* global pairwise alignment of every member against the center, one
  vectorised DP row at a time (the within-row "gap in center" dependency is
  resolved with a prefix-max relaxation, so each row is pure vector ops);
* the classic center-star merge: per-center-position gap slots sized by the
  max insertion any pairwise alignment requires.

A center-star MSA is not column-identical to MAFFT's progressive alignment;
for bit-parity regression the pipeline ingests reference-produced .tmsa
files directly (pipeline stage ``align: external``).  The conserved windows
the design engine feeds on are stable across both.
"""

from __future__ import annotations

import numpy as np

from ..cluster.greedy import _encode, kmer_set

MATCH, MISMATCH, GAP = 2, -1, -2
GAP_OPEN, GAP_EXT = -4, -1


def pick_center(seqs, k=12, sample=200):
    """Index of the sequence with the largest summed k-mer Jaccard."""
    if len(seqs) == 1:
        return 0
    idx = list(range(len(seqs)))
    if len(idx) > sample:
        step = len(idx) / sample
        idx = sorted({int(i * step) for i in range(sample)})
    sets = {i: kmer_set(_encode(seqs[i]), k) for i in idx}
    best, best_score = idx[0], -1.0
    for i in idx:
        score = 0.0
        for j in idx:
            if i == j:
                continue
            a, b = sets[i], sets[j]
            if a.size and b.size:
                inter = np.intersect1d(a, b, assume_unique=True).size
                score += inter / (a.size + b.size - inter)
        if score > best_score:
            best, best_score = i, score
    return best


def align_ops(a, b, affine=True):
    """Global alignment op string between code arrays a (center) and b.

    Returns a list of ops: 'M' consumes one char of each, 'D' consumes only
    the center (gap in member), 'I' consumes only the member (gap in
    center).  Affine gaps (Gotoh) by default; each DP row is vectorised —
    the within-row left dependency of both the linear and the affine E
    matrix folds into a prefix-max relaxation.
    """
    if not affine:
        return _align_ops_linear(a, b)
    la, lb = len(a), len(b)
    if la == 0:
        return ["I"] * lb
    if lb == 0:
        return ["D"] * la
    NEG = np.int32(-1 << 28)
    jar = np.arange(lb + 1, dtype=np.int32)
    # V = best score, F = gap-in-b (vertical) state
    v_prev = np.empty(lb + 1, np.int32)
    v_prev[0] = 0
    v_prev[1:] = GAP_OPEN + GAP_EXT * jar[1:]
    f_prev = np.full(lb + 1, NEG, np.int32)
    # packed backpointers: 2 bits state ptr + flags for gap continuations
    ptr = np.zeros((la + 1, lb + 1), np.uint8)   # 0 diag, 1 up, 2 left
    fcont = np.zeros((la + 1, lb + 1), bool)     # F came from F (extend up)
    econt = np.zeros((la + 1, lb + 1), bool)     # E came from E (extend left)
    ptr[0, 1:] = 2
    econt[0, 2:] = True
    for i in range(1, la + 1):
        sub = np.where((b == a[i - 1]) & (a[i - 1] < 4), MATCH,
                       MISMATCH).astype(np.int32)
        f_cur = np.maximum(f_prev + GAP_EXT, v_prev + GAP_OPEN + GAP_EXT)
        fcont[i] = f_prev + GAP_EXT >= v_prev + GAP_OPEN + GAP_EXT
        diag = v_prev[:-1] + sub
        vert = np.empty(lb + 1, np.int32)
        vert[0] = f_cur[0]
        vert[1:] = np.maximum(diag, f_cur[1:])
        p = np.empty(lb + 1, np.uint8)
        p[0] = 1
        p[1:] = np.where(diag >= f_cur[1:], 0, 1)
        # E (gap in center): E[j] = max(E[j-1]+ext, V[j-1]+open+ext); with
        # t[j] = cand[j] - ext*j the recurrence is a running prefix max.
        t = vert + GAP_OPEN - GAP_EXT * jar      # candidate openings at j'
        run = np.maximum.accumulate(t[:-1])
        e_cur = np.full(lb + 1, NEG, np.int32)
        e_cur[1:] = run + GAP_EXT * jar[1:]
        # econt: E[j] extends an E (i.e. the opening was before j-1)
        open_here = vert[:-1] + GAP_OPEN - GAP_EXT * jar[:-1]
        econt[i, 1:] = open_here < run
        v_cur = np.maximum(vert, e_cur)
        p = np.where(e_cur > vert, 2, p).astype(np.uint8)
        ptr[i] = p
        v_prev, f_prev = v_cur, f_cur
    ops = []
    i, j = la, lb
    state = 0      # 0 main, 1 in-F, 2 in-E
    while i > 0 or j > 0:
        if i == 0:
            m = 2
        elif j == 0:
            m = 1
        elif state == 1:
            m = 1
        elif state == 2:
            m = 2
        else:
            m = ptr[i, j]
        if m == 0:
            ops.append("M")
            i -= 1
            j -= 1
            state = 0
        elif m == 1:
            ops.append("D")
            state = 1 if fcont[i, j] else 0
            i -= 1
        else:
            ops.append("I")
            if i > 0 and j > 0:
                state = 2 if econt[i, j] else 0
            else:
                state = 0
            j -= 1
    ops.reverse()
    return ops


def _align_ops_linear(a, b):
    la, lb = len(a), len(b)
    if la == 0:
        return ["I"] * lb
    if lb == 0:
        return ["D"] * la
    jar = np.arange(lb + 1, dtype=np.int32)
    prev = (GAP * jar).astype(np.int32)
    ptr = np.zeros((la + 1, lb + 1), np.uint8)   # 0 diag, 1 up, 2 left
    ptr[0, 1:] = 2
    for i in range(1, la + 1):
        sub = np.where((b == a[i - 1]) & (a[i - 1] < 4), MATCH,
                       MISMATCH).astype(np.int32)
        vert = np.empty(lb + 1, np.int32)
        vert[0] = prev[0] + GAP
        diag = prev[:-1] + sub
        up = prev[1:] + GAP
        vert[1:] = np.maximum(diag, up)
        p = np.empty(lb + 1, np.uint8)
        p[0] = 1
        p[1:] = np.where(diag >= up, 0, 1)
        # gap-in-center (left) moves: dp[j] = max_{j'<=j} vert[j'] + GAP*(j-j')
        t = vert - GAP * jar
        cur = (np.maximum.accumulate(t) + GAP * jar).astype(np.int32)
        p = np.where(cur > vert, 2, p).astype(np.uint8)
        ptr[i] = p
        prev = cur
    ops = []
    i, j = la, lb
    while i > 0 or j > 0:
        if i == 0:
            m = 2
        elif j == 0:
            m = 1
        else:
            m = ptr[i, j]
        if m == 0:
            ops.append("M")
            i -= 1
            j -= 1
        elif m == 1:
            ops.append("D")
            i -= 1
        else:
            ops.append("I")
            j -= 1
    ops.reverse()
    return ops


def align_ops_batch(c, member_codes):
    """align_ops for many members at once: one vectorised row loop over
    [M, lb+1] state arrays (identical results to per-member align_ops)."""
    la = len(c)
    ms = len(member_codes)
    lbs = np.array([len(b) for b in member_codes])
    lb_max = int(lbs.max())
    bmat = np.full((ms, lb_max), 4, np.int8)
    for i, b in enumerate(member_codes):
        bmat[i, :len(b)] = b
    NEG = np.int32(-1 << 28)
    jar = np.arange(lb_max + 1, dtype=np.int32)
    valid = jar[None, :] <= lbs[:, None]
    v_prev = np.where(valid, GAP_OPEN + GAP_EXT * jar[None, :], NEG
                      ).astype(np.int32)
    v_prev[:, 0] = 0
    f_prev = np.full((ms, lb_max + 1), NEG, np.int32)
    ptr = np.zeros((la + 1, ms, lb_max + 1), np.uint8)
    fcont = np.zeros((la + 1, ms, lb_max + 1), bool)
    econt = np.zeros((la + 1, ms, lb_max + 1), bool)
    ptr[0, :, 1:] = 2
    econt[0, :, 2:] = True
    for i in range(1, la + 1):
        sub = np.where((bmat == c[i - 1]) & (c[i - 1] < 4), MATCH,
                       MISMATCH).astype(np.int32)
        f_cur = np.maximum(f_prev + GAP_EXT, v_prev + GAP_OPEN + GAP_EXT)
        fcont[i] = f_prev + GAP_EXT >= v_prev + GAP_OPEN + GAP_EXT
        diag = v_prev[:, :-1] + sub
        vert = np.empty_like(v_prev)
        vert[:, 0] = f_cur[:, 0]
        vert[:, 1:] = np.maximum(diag, f_cur[:, 1:])
        p = np.empty_like(ptr[0])
        p[:, 0] = 1
        p[:, 1:] = np.where(diag >= f_cur[:, 1:], 0, 1)
        t = vert + GAP_OPEN - GAP_EXT * jar[None, :]
        run = np.maximum.accumulate(t[:, :-1], axis=1)
        e_cur = np.full_like(v_prev, NEG)
        e_cur[:, 1:] = run + GAP_EXT * jar[None, 1:]
        open_here = vert[:, :-1] + GAP_OPEN - GAP_EXT * jar[None, :-1]
        econt[i, :, 1:] = open_here < run
        v_cur = np.where(valid, np.maximum(vert, e_cur), NEG)
        p = np.where(e_cur > vert, 2, p).astype(np.uint8)
        ptr[i] = p
        v_prev, f_prev = v_cur, np.where(valid, f_cur, NEG)
    out = []
    for mi in range(ms):
        ops = []
        i, j = la, int(lbs[mi])
        state = 0
        while i > 0 or j > 0:
            if i == 0:
                mv = 2
            elif j == 0:
                mv = 1
            elif state == 1:
                mv = 1
            elif state == 2:
                mv = 2
            else:
                mv = ptr[i, mi, j]
            if mv == 0:
                ops.append("M")
                i -= 1
                j -= 1
                state = 0
            elif mv == 1:
                ops.append("D")
                state = 1 if fcont[i, mi, j] else 0
                i -= 1
            else:
                ops.append("I")
                if i > 0 and j > 0:
                    state = 2 if econt[i, mi, j] else 0
                else:
                    state = 0
                j -= 1
        ops.reverse()
        out.append(ops)
    return out


def _use_device_backend(backend, n_members, la):
    if backend == "device":
        return True
    if backend != "auto":
        return False
    # Device DP wins once the pointer tensor is big enough to amortise the
    # dispatch; on a CPU-only jax it still beats the NumPy loop via scan
    # fusion, but only clearly at scale.
    if n_members * la < 64 * 256:
        return False
    try:
        import jax
        return jax.default_backend() != "cpu" or n_members * la > 512 * 1024
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        return False


def center_star_msa(ids, seqs, backend="auto"):
    """-> (ids, aligned rows as equal-length strings).

    ``backend``: "numpy" = vectorised host row loop, "device" = the
    jax scan DP + on-device backtrace (align/device.py), "auto" picks the
    device path when a TPU is attached and the cluster is big enough.
    Both produce identical op strings, so the MSA is backend-invariant.
    """
    if len(seqs) == 1:
        return ids, [seqs[0]]
    center = pick_center(seqs)
    codes = [_encode(s) for s in seqs]
    c = codes[center]
    member_idx = [m for m in range(len(seqs)) if m != center]
    per_member = [None] * len(seqs)
    if _use_device_backend(backend, len(member_idx), len(c)):
        from .device import align_ops_batch_device
        batch = align_ops_batch_device(c, [codes[m] for m in member_idx])
        for m, ops in zip(member_idx, batch):
            per_member[m] = ops
    else:
        # Chunk so the [la, M, lb] pointer tensors stay within ~1 GB.
        lb_max = max(len(codes[m]) for m in member_idx)
        chunk = max(1, int(1e9 // max((len(c) + 1) * (lb_max + 1) * 3, 1)))
        for lo in range(0, len(member_idx), chunk):
            part = member_idx[lo:lo + chunk]
            batch = align_ops_batch(c, [codes[m] for m in part])
            for m, ops in zip(part, batch):
                per_member[m] = ops
    la = len(c)
    # master gap slot before each center position (+ one trailing slot)
    slot = np.zeros(la + 1, np.int64)
    for ops in per_member:
        if ops is None:
            continue
        ci = run = 0
        for op in ops:
            if op == "I":
                run += 1
            else:
                slot[ci] = max(slot[ci], run)
                run = 0
                ci += 1
        slot[la] = max(slot[la], run)
    rows = []
    center_chars = []
    for i in range(la):
        center_chars.append("-" * int(slot[i]))
        center_chars.append(seqs[center][i])
    center_chars.append("-" * int(slot[la]))
    center_row = "".join(center_chars)
    for m in range(len(seqs)):
        if m == center:
            rows.append(center_row)
            continue
        ops = per_member[m]
        out = []
        mi = ci = 0
        run = []
        for op in ops:
            if op == "I":
                run.append(seqs[m][mi])
                mi += 1
            else:
                out.append("".join(run) + "-" * int(slot[ci] - len(run)))
                run = []
                if op == "M":
                    out.append(seqs[m][mi])
                    mi += 1
                else:
                    out.append("-")
                ci += 1
        out.append("".join(run) + "-" * int(slot[la] - len(run)))
        rows.append("".join(out))
    assert len({len(r) for r in rows}) == 1
    return ids, rows


def write_msa(ids, rows, path, width=60):
    with open(path, "w") as f:
        for i, r in zip(ids, rows):
            f.write(">" + i.lstrip(">") + "\n")
            for off in range(0, len(r), width):
                f.write(r[off:off + width] + "\n")
