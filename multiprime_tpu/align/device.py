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


def align_ops_batch_device(c, member_codes, member_block=512):
    """Drop-in device equivalent of ``centerstar.align_ops_batch``.

    ``c`` and ``member_codes`` are int code arrays (A=0..T=3, other=4+).
    Returns one op list (['M'|'D'|'I'] strings) per member, identical to
    the NumPy path.
    """
    import jax
    import jax.numpy as jnp

    la = len(c)
    lbs_all = np.array([len(b) for b in member_codes], np.int32)
    out = [None] * len(member_codes)
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
               jnp.asarray(bmat), jnp.asarray(lbs_p))))
        for i in range(len(part)):
            codes = ops_rev[i]
            real = codes[codes != _PAD_OP][::-1]
            out[lo + i] = list(_OP_CHARS[real])
    return out
