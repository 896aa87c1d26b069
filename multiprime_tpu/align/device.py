"""Device-side batched Gotoh alignment for the center-star MSA.

TPU-native path for :func:`multiprime_tpu.align.centerstar.align_ops_batch`
(the MAFFT/MUSCLE replacement, run_mafft.py:66-72 in the reference): the
whole pointer tensor stays in device HBM and the backtrace runs on device
too, so only the op codes (``[M, la+lb] uint8``, a few MB) ever cross the
host link.  Produces bit-identical op strings to the NumPy row loop —
same scores, same tie-breaking.

Layout/compile notes:
* the DP is one ``lax.scan`` over center rows; each step is pure vector
  work on ``[M, lb+1]`` int32 lanes (VPU-shaped, no matmuls);
* the within-row affine-E dependency folds into ``lax.cummax`` exactly like
  the NumPy prefix max (values are tie-insensitive);
* shapes are bucketed (rows/cols to multiples of 256, members to 64) so a
  whole pipeline run compiles a handful of executables, not one per
  cluster.
"""

from __future__ import annotations

import functools

import numpy as np

from .centerstar import GAP_EXT, GAP_OPEN, MATCH, MISMATCH

_NEG = np.int32(-1 << 28)
_PAD_OP = 3
_OP_CHARS = np.array(["M", "D", "I", ""], dtype=object)


def _round_up(x, mult):
    return ((int(x) + mult - 1) // mult) * mult


@functools.lru_cache(maxsize=None)
def _build(la_pad: int, lb_pad: int, m_pad: int):
    from .. import ops as _ops  # noqa: F401 — enables persistent compile cache
    import jax
    import jax.numpy as jnp

    def run(c_codes, la_true, bmat, lbs):
        jar = jnp.arange(lb_pad + 1, dtype=jnp.int32)
        valid = jar[None, :] <= lbs[:, None]
        v0 = jnp.where(valid, GAP_OPEN + GAP_EXT * jar[None, :], _NEG)
        v0 = v0.at[:, 0].set(0).astype(jnp.int32)
        f0 = jnp.full((m_pad, lb_pad + 1), _NEG, jnp.int32)

        def row(carry, ci):
            v_prev, f_prev = carry
            sub = jnp.where((bmat == ci) & (ci < 4), MATCH, MISMATCH)
            sub = sub.astype(jnp.int32)
            f_ext = f_prev + GAP_EXT
            f_open = v_prev + (GAP_OPEN + GAP_EXT)
            f_cur = jnp.maximum(f_ext, f_open)
            fcont = f_ext >= f_open
            diag = v_prev[:, :-1] + sub
            vert = jnp.concatenate(
                [f_cur[:, :1], jnp.maximum(diag, f_cur[:, 1:])], axis=1)
            p = jnp.concatenate(
                [jnp.ones((m_pad, 1), jnp.uint8),
                 jnp.where(diag >= f_cur[:, 1:], 0, 1).astype(jnp.uint8)],
                axis=1)
            t = vert + GAP_OPEN - GAP_EXT * jar[None, :]
            run_max = jax.lax.cummax(t[:, :-1], axis=1)
            e_cur = jnp.concatenate(
                [jnp.full((m_pad, 1), _NEG, jnp.int32),
                 run_max + GAP_EXT * jar[None, 1:]], axis=1)
            open_here = t[:, :-1]
            econt = jnp.concatenate(
                [jnp.zeros((m_pad, 1), bool), open_here < run_max], axis=1)
            v_cur = jnp.where(valid, jnp.maximum(vert, e_cur), _NEG)
            p = jnp.where(e_cur > vert, jnp.uint8(2), p)
            packed = (p | (fcont.astype(jnp.uint8) << 2)
                      | (econt.astype(jnp.uint8) << 3))
            f_keep = jnp.where(valid, f_cur, _NEG)
            return (v_cur, f_keep), packed

        _, rows = jax.lax.scan(row, (v0, f0), c_codes)
        row0 = (jnp.where(jar >= 1, 2, 0)
                | jnp.where(jar >= 2, 8, 0)).astype(jnp.uint8)
        packed = jnp.concatenate(
            [jnp.broadcast_to(row0[None, None, :], (1, m_pad, lb_pad + 1)),
             rows], axis=0)                      # [la_pad+1, M, lb_pad+1]

        midx = jnp.arange(m_pad, dtype=jnp.int32)

        def trace_step(carry, _):
            i, j, st = carry
            done = (i == 0) & (j == 0)
            pf = packed[i, midx, j].astype(jnp.int32)
            mv = jnp.where(
                i == 0, 2,
                jnp.where(j == 0, 1,
                          jnp.where(st == 1, 1,
                                    jnp.where(st == 2, 2, pf & 3))))
            fc = (pf >> 2) & 1
            ec = (pf >> 3) & 1
            di = jnp.where(mv == 2, 0, 1)
            dj = jnp.where(mv == 1, 0, 1)
            new_st = jnp.where(
                mv == 0, 0,
                jnp.where(mv == 1, fc,
                          jnp.where((i > 0) & (j > 0), 2 * ec, 0)))
            op = jnp.where(done, _PAD_OP, mv).astype(jnp.uint8)
            i2 = jnp.where(done, 0, i - di)
            j2 = jnp.where(done, 0, j - dj)
            st2 = jnp.where(done, 0, new_st)
            return (i2, j2, st2), op

        i0 = jnp.full((m_pad,), la_true, jnp.int32)
        st0 = jnp.zeros((m_pad,), jnp.int32)
        _, ops = jax.lax.scan(trace_step, (i0, lbs, st0), None,
                              length=la_pad + lb_pad)
        return ops.T                              # [M, steps], reverse order

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build_refine(c_pad: int, lmax_pad: int, m_pad: int):
    from .. import ops as _ops  # noqa: F401 — enables persistent compile cache
    import jax
    import jax.numpy as jnp

    NEGF = jnp.float32(-1e30)

    def run(res_codes, lens, s4_cols, go_cols, ge_cols, occ2_cols, c_true):
        # res_codes [M, lmax] int32 (codes 0..5), lens [M]
        # s4_cols  [C, M, 6]  = 4*f6 per column (host-rounded f32)
        # go_cols/ge_cols/occ2_cols [C, M] = GAP_OPEN*occ, GAP_EXT*occ, 2*occ
        iar = jnp.arange(lmax_pad + 1, dtype=jnp.int32)
        active = iar[None, :] <= lens[:, None]
        v0 = jnp.where(iar[None, :] == 0, 0.0, NEGF)
        v0 = jnp.broadcast_to(v0, (m_pad, lmax_pad + 1)).astype(jnp.float32)
        g0 = jnp.full((m_pad, lmax_pad + 1), NEGF, jnp.float32)
        bv0 = jnp.full((m_pad,), NEGF, jnp.float32)
        bj0 = jnp.zeros((m_pad,), jnp.int32)
        marange = jnp.arange(m_pad)
        # One-hot residue codes: the per-column profile lookup becomes an
        # einsum (adds exact zeros -> identical f32 values to a gather, but
        # batched-matmul shaped instead of a per-step gather).
        res_oh = jax.nn.one_hot(res_codes, 6, dtype=jnp.float32)
        end_mask = (iar[None, :] == lens[:, None]).astype(jnp.float32)

        def col(carry, xs):
            v_prev, g_prev, best_v, best_j, j = carry
            s4_j, go_j, ge_j, occ2_j = xs
            # s_col = 2*(2*f6_gather - occ): host pre-scales make every
            # device op a single add/sub so rounding matches NumPy exactly.
            gath = jnp.einsum("mlc,mc->ml", res_oh, s4_j)       # [M, lmax]
            s_col = gath - occ2_j[:, None]
            open_cand = v_prev + go_j[:, None]
            gcont = g_prev >= open_cand
            g_cur = jnp.maximum(g_prev, open_cand) + ge_j[:, None]
            diag = jnp.concatenate(
                [jnp.full((m_pad, 1), NEGF, jnp.float32),
                 v_prev[:, :-1] + s_col], axis=1)
            take_skip = g_cur > diag
            v_cur = jnp.where(take_skip, g_cur, diag)
            v_cur = v_cur.at[:, 0].set(0.0)
            v_cur = jnp.where(active, v_cur, NEGF)
            g_cur = jnp.where(active, g_cur, NEGF)
            ptr_row = (take_skip.astype(jnp.uint8)
                       | (gcont.astype(jnp.uint8) << 1))
            # masked reduce instead of a per-step gather; exact because the
            # mask has a single 1 per row and x + 0.0 == x (NEGF is finite)
            v_end = jnp.sum(v_cur * end_mask, axis=1)
            upd = (v_end > best_v) & (j <= c_true)
            best_v = jnp.where(upd, v_end, best_v)
            best_j = jnp.where(upd, j, best_j)
            return (v_cur, g_cur, best_v, best_j, j + 1), ptr_row

        xs = (s4_cols, go_cols, ge_cols, occ2_cols)
        (_, _, _, best_j, _), ptr = jax.lax.scan(
            col, (v0, g0, bv0, bj0, jnp.int32(1)), xs)
        # ptr[j-1, m, i] for column j

        def trace_step(carry, _):
            i, j, skip = carry
            done = i == 0
            jj = jnp.maximum(j, 1)
            p = ptr[jj - 1, marange, jnp.minimum(i, lmax_pad)].astype(jnp.int32)
            take = jnp.where(j <= i, False,
                             jnp.where(skip, True, (p & 1) == 1))
            place = (~done) & (~take)
            col_out = jnp.where(place, j - 1, -1)
            skip2 = jnp.where(done, False,
                              jnp.where(take, (p & 2) == 2, False))
            i2 = jnp.where(done | take, i, i - 1)
            j2 = jnp.where(done, j, j - 1)
            return (i2, j2, skip2), col_out

        _, cols = jax.lax.scan(trace_step, (lens, best_j, jnp.zeros(
            (m_pad,), bool)), None, length=c_pad)
        return cols.T                       # [M, c_pad]; -1 = no placement

    return jax.jit(run)


def refine_pass_device(res_chars, res_codes, lens, f6, occ, c,
                       go=-4.0, ge=-1.0, member_block=256):
    """Device twin of refine._realign_chunk: returns new row byte-strings.

    f6 [M, C, 6], occ [M, C] float32 (self-excluded profile), res_codes
    [M, lmax] int codes, lens [M].  Host pre-scales every multiply so the
    device DP is add/max-only and rounds identically to the NumPy path.
    """
    import jax
    import jax.numpy as jnp

    m = len(res_chars)
    lmax = res_codes.shape[1]
    rows = []
    for lo in range(0, m, member_block):
        sel = slice(lo, min(lo + member_block, m))
        mc = sel.stop - sel.start
        m_pad = _round_up(mc, 8)
        lmax_pad = _round_up(max(lmax, 1), 128)
        c_pad = _round_up(max(c, 1), 256)
        s4 = np.zeros((c_pad, m_pad, 6), np.float32)
        s4[:c, :mc] = (4.0 * f6[sel]).astype(np.float32).transpose(1, 0, 2)
        occ_p = np.zeros((c_pad, m_pad), np.float32)
        occ_p[:c, :mc] = occ[sel].astype(np.float32).T
        go_c = (np.float32(go) * occ_p).astype(np.float32)
        ge_c = (np.float32(ge) * occ_p).astype(np.float32)
        occ2 = (np.float32(2.0) * occ_p).astype(np.float32)
        rc = np.full((m_pad, lmax_pad), 5, np.int32)
        rc[:mc, :lmax] = res_codes[sel]
        ln = np.zeros(m_pad, np.int32)
        ln[:mc] = lens[sel]
        fn = _build_refine(c_pad, lmax_pad, m_pad)
        cols = np.asarray(jax.device_get(fn(
            jnp.asarray(rc), jnp.asarray(ln), jnp.asarray(s4),
            jnp.asarray(go_c), jnp.asarray(ge_c), jnp.asarray(occ2),
            jnp.int32(c))))[:mc]
        # Vectorised placement: the trace emits residues last-to-first, so
        # the r-th placed column of member k carries chars[lens[k]-1-r].
        chars_mat = np.zeros((mc, lmax if lmax else 1), np.uint8)
        for k in range(mc):
            b = res_chars[lo + k]
            chars_mat[k, :len(b)] = np.frombuffer(b, np.uint8)
        placed_mask = cols >= 0
        rank = np.cumsum(placed_mask, axis=1, dtype=np.int64) - 1
        rk, sk = np.nonzero(placed_mask)
        res_idx = lens[lo + rk] - 1 - rank[rk, sk]
        out_mat = np.full((mc, c), ord("-"), np.uint8)
        out_mat[rk, cols[rk, sk]] = chars_mat[rk, res_idx]
        row_bytes = out_mat.tobytes()
        rows.extend(row_bytes[k * c:(k + 1) * c] for k in range(mc))
    return rows


def align_ops_batch_device(c, member_codes, member_block=512,
                           as_codes=False):
    """Drop-in device equivalent of ``centerstar.align_ops_batch``.

    ``c`` and ``member_codes`` are int code arrays (A=0..T=3, other=4+).
    Returns one op list (['M'|'D'|'I'] strings) per member, identical to
    the NumPy path; with ``as_codes=True``, instead returns the forward
    uint8 code matrix [M, S] (0=M, 1=D, 2=I, 3=pad at the end) consumed by
    ``centerstar._merge_rows_vec`` without per-op Python lists.
    """
    import jax
    import jax.numpy as jnp

    la = len(c)
    lbs_all = np.array([len(b) for b in member_codes], np.int32)
    out = [None] * len(member_codes)
    parts = []
    la_pad = _round_up(max(la, 1), 256)
    # Padded rows use sentinel code 5 (always MISMATCH, never visited by
    # the trace, which starts at the true la).
    c_pad = np.full(la_pad, 5, np.int32)
    c_pad[:la] = np.asarray(c, np.int32)
    for lo in range(0, len(member_codes), member_block):
        part = member_codes[lo:lo + member_block]
        lbs = lbs_all[lo:lo + member_block]
        lb_pad = _round_up(max(int(lbs.max()) if len(lbs) else 1, 1), 256)
        m_pad = _round_up(len(part), 64)
        bmat = np.full((m_pad, lb_pad), 4, np.int32)
        for i, b in enumerate(part):
            bmat[i, :len(b)] = np.asarray(b, np.int32)
        lbs_p = np.zeros(m_pad, np.int32)
        lbs_p[:len(part)] = lbs
        fn = _build(la_pad, lb_pad, m_pad)
        ops_rev = np.asarray(jax.device_get(
            fn(jnp.asarray(c_pad), jnp.int32(la),
               jnp.asarray(bmat), jnp.asarray(lbs_p))))[:len(part)]
        if as_codes:
            # reverse + left-shift out the pad prefix, all in NumPy
            s_blk = ops_rev.shape[1]
            n_real = (ops_rev != _PAD_OP).sum(axis=1)
            flipped = ops_rev[:, ::-1]
            idx = np.arange(s_blk)[None, :] + (s_blk - n_real)[:, None]
            fwd = np.take_along_axis(
                flipped, np.minimum(idx, s_blk - 1), axis=1)
            fwd[np.arange(s_blk)[None, :] >= n_real[:, None]] = _PAD_OP
            parts.append(fwd)
            continue
        for i in range(len(part)):
            codes = ops_rev[i]
            real = codes[codes != _PAD_OP][::-1]
            out[lo + i] = list(_OP_CHARS[real])
    if as_codes:
        smax = max(p.shape[1] for p in parts)
        fmat = np.full((len(member_codes), smax), _PAD_OP, np.uint8)
        row = 0
        for p in parts:
            fmat[row:row + len(p), :p.shape[1]] = p
            row += len(p)
        return fmat
    return out
