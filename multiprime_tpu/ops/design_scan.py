"""Batched window-design statistics on device — Stage A of the MC-EDPD engine.

Computes, for EVERY primer-length window of an MSA at once (the reference
iterates windows in a process pool, multiPrime-core.py:1141-1143):

* gap-patched window tensors (core.py:666-687 semantics via prefix-sum
  gathers),
* per-window base-frequency tensors [W, plen, 4] and nearest-neighbour
  transition tensors [W, plen-1, 4, 4], weighted by IUPAC expansion
  multiplicity exactly like the reference's expansion counting,
* per-window gap/coverage counts,
* the batched Viterbi consensus path (core.py:579-593) as one lax.scan.

All counts are integers (int32 on device) and match the host reference
bit-for-bit; the order-dependent Stage-B refinement consumes them on host.

Sharding: the sequence axis is the data-parallel axis — freq/NN/count
tensors are plain per-shard sums that merge with psum; windows are
independent and shard freely.  See multiprime_tpu.parallel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# popcount / member-count tables for 4-bit IUPAC masks.
_POP = np.array([bin(i).count("1") for i in range(16)], dtype=np.int32)
_MC = np.maximum(_POP, 1)        # '-' (mask 0) expands to itself: 1 member


def patch_windows(masks, positions, plen):
    """Gap-patched windows for all start positions.

    masks: int32 [N, L] IUPAC 4-bit masks (0 = gap)
    positions: int32 [W] window starts
    -> int32 [N, W, plen] patched masks
    """
    n, length = masks.shape
    gap = masks == 0
    nz = ~gap
    pos = jnp.arange(length)
    cs = jnp.cumsum(nz, axis=1)
    before = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), cs[:, :-1].astype(jnp.int32)], axis=1)
    total = cs[:, -1].astype(jnp.int32)
    nxt = jnp.where(nz, pos[None, :], length)
    nxt = jax.lax.cummin(nxt[:, ::-1], axis=1)[:, ::-1]
    run_from = (nxt - pos[None, :]).astype(jnp.int32)
    prv = jnp.where(nz, pos[None, :], -1)
    prv = jax.lax.cummax(prv, axis=1)
    run_to = (pos[None, :] - prv).astype(jnp.int32)
    # left-packed gapless characters
    packed = jnp.zeros_like(masks)
    scatter_idx = jnp.where(nz, before, length)   # gaps -> OOB, dropped
    packed = packed.at[jnp.arange(n)[:, None], scatter_idx].set(
        jnp.where(nz, masks, 0), mode="drop")

    j = jnp.arange(plen)
    win = masks[:, positions[:, None] + j[None, :]]          # [N, W, plen]
    lead = jnp.minimum(run_from[:, positions], plen)         # [N, W]
    trail = jnp.minimum(run_to[:, positions + plen - 1], plen)
    allgap = lead >= plen
    c_start = before[:, positions]
    c_end = before[:, positions + plen - 1] \
        + nz[:, positions + plen - 1].astype(jnp.int32)
    use_lead = (~allgap) & (lead > 0) & (c_start >= lead)
    use_trail = (~allgap) & (trail > 0) & \
        ((total[:, None] - c_end) >= trail)
    lead_idx = jnp.clip(c_start[:, :, None] - lead[:, :, None] + j, 0,
                        length - 1)
    lead_vals = jnp.take_along_axis(
        packed, lead_idx.reshape(n, -1), axis=1).reshape(win.shape)
    win = jnp.where(use_lead[:, :, None] & (j < lead[:, :, None]),
                    lead_vals, win)
    trail_off = j - (plen - trail[:, :, None])
    trail_idx = jnp.clip(c_end[:, :, None] + trail_off, 0, length - 1)
    trail_vals = jnp.take_along_axis(
        packed, trail_idx.reshape(n, -1), axis=1).reshape(win.shape)
    win = jnp.where(use_trail[:, :, None] & (trail_off >= 0),
                    trail_vals, win)
    return win


def window_stats(win, variation):
    """Per-window tensors from patched windows.

    win: int32 [N, W, plen] masks
    -> dict with freq [W, plen, 4], nn [W, plen-1, 4, 4],
       cover_number [W], gap_number [W] (all int32/int64)

    freq/nn are weighted by expansion multiplicity: a window with member
    counts mc_j contributes prod(mc)/mc_j copies of each member base at j —
    identical totals to the reference's per-expansion counting.
    """
    pop = jnp.asarray(_POP)[win]                   # members per char
    mc = jnp.asarray(_MC)[win].astype(jnp.int64)
    gapcnt = jnp.sum(win == 0, axis=2)
    is_gap = gapcnt > variation                    # [N, W]
    alive = ~is_gap
    total_exp = jnp.prod(mc, axis=2)               # [N, W] expansion count
    w_pos = total_exp[:, :, None] // mc            # [N, W, plen]
    member = ((win[:, :, :, None] >> jnp.arange(4)[None, None, None, :]) & 1)
    wa = jnp.where(alive[:, :, None], w_pos, 0)
    freq = jnp.einsum("nwj,nwjb->wjb", wa, member.astype(jnp.int64))
    # NN: weight total/(mc_j * mc_{j+1})
    w_pair = jnp.where(alive[:, :, None],
                       total_exp[:, :, None] // (mc[:, :, :-1] * mc[:, :, 1:]),
                       0)
    nn = jnp.einsum("nwj,nwja,nwjb->wjab", w_pair,
                    member[:, :, :-1, :].astype(jnp.int64),
                    member[:, :, 1:, :].astype(jnp.int64))
    cover_number = jnp.sum(alive, axis=0)
    gap_number = jnp.sum(is_gap, axis=0)
    return {"freq": freq, "nn": nn,
            "cover_number": cover_number, "gap_number": gap_number}


def viterbi_batch(freq, nn):
    """Batched max-sum consensus (core.py:579-593). freq [W, plen, 4],
    nn [W, plen-1, 4, 4] -> paths int32 [W, plen]."""
    freq = freq.astype(jnp.int64)
    nn = nn.astype(jnp.int64)

    def step(scores, inputs):
        trans, obs = inputs               # [W,4,4], [W,4]
        m = scores[:, :, None] + trans + obs[:, None, :]
        back = jnp.argmax(m, axis=1)      # first max, like np.argmax
        return jnp.max(m, axis=1), back

    init = freq[:, 0, :]
    scores, backs = jax.lax.scan(
        step, init,
        (jnp.moveaxis(nn, 1, 0), jnp.moveaxis(freq[:, 1:, :], 1, 0)))
    last = jnp.argmax(scores, axis=1)     # [W]

    def back_step(state, back_t):
        idx = back_t[jnp.arange(back_t.shape[0]), state]
        return idx, state

    first, rest = jax.lax.scan(back_step, last, backs, reverse=True)
    paths = jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    return paths.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("plen", "variation"))
def design_stats(masks, positions, *, plen=18, variation=1):
    """The fused Stage-A step: masks [N, L] + window starts [W] ->
    per-window tensors + Viterbi consensus."""
    win = patch_windows(masks, positions, plen)
    stats = window_stats(win, variation)
    stats["viterbi"] = viterbi_batch(stats["freq"], stats["nn"])
    return stats


@functools.partial(jax.jit, static_argnames=("plen", "variation"))
def design_stats_full(masks, positions, *, plen=18, variation=1):
    """design_stats that also returns the patched windows themselves (int8
    masks, [N, W, plen]) so host Stage B consumes them without re-patching."""
    win = patch_windows(masks, positions, plen)
    stats = window_stats(win, variation)
    stats["viterbi"] = viterbi_batch(stats["freq"], stats["nn"])
    stats["win"] = win.astype(jnp.int8)
    return stats


def design_stats_blocks(masks, positions, *, plen=18, variation=1,
                        block=512):
    """Host-side block runner over the window axis: positions are processed
    in fixed-size blocks (the last block padded by repeating its final
    position) so every call after the first reuses one compiled executable.
    Yields (pos_block, stats_numpy) per block with padding already dropped.

    masks: uint8/int32 [N, L] IUPAC 4-bit masks; positions: int [W].
    """
    masks = np.ascontiguousarray(masks, dtype=np.int32)
    positions = np.asarray(positions, dtype=np.int32)
    for b0 in range(0, len(positions), block):
        pos = positions[b0:b0 + block]
        n_real = len(pos)
        if n_real < block:
            pos = np.concatenate(
                [pos, np.full(block - n_real, pos[-1], np.int32)])
        out = design_stats_full(masks, pos, plen=plen, variation=variation)
        out = {k: np.asarray(v) for k, v in out.items()}
        if n_real < block:
            out = {k: (v[:, :n_real] if k == "win" else v[:n_real])
                   for k, v in out.items()}
        yield positions[b0:b0 + block], out
