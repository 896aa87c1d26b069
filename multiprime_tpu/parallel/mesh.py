"""Device-mesh sharding for the design and scan kernels.

The workload has two natural parallel axes:

* ``seq``  — target/MSA sequences (data parallel).  Window statistics and
  coverage counts are plain sums over this axis -> merged with psum.
* ``win``  — window positions / primer candidates.  Fully independent ->
  plain data parallelism, no collectives.

The reference has no distributed story at all (single host, process pools,
SURVEY §2.4); this module is the TPU-native replacement: a 2-D
``Mesh(('seq', 'win'))`` with shard_map'd kernels whose collectives ride ICI.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import design_scan, mismatch_scan


def make_mesh(n_devices=None, seq_axis=None):
    """Build a (seq, win) mesh over the available devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if seq_axis is None:
        # favour the seq axis: counts merge with one psum; windows need none
        seq_axis = n_devices
        win_axis = 1
        for cand in range(int(np.sqrt(n_devices)), 0, -1):
            if n_devices % cand == 0:
                seq_axis, win_axis = n_devices // cand, cand
                break
    else:
        win_axis = n_devices // seq_axis
    mesh_devices = np.array(devices).reshape(seq_axis, win_axis)
    return Mesh(mesh_devices, ("seq", "win"))


def design_stats_sharded(mesh, masks, positions, *, plen=18, variation=1):
    """Multi-chip Stage-A: masks sharded over 'seq', windows over 'win';
    freq/NN/count tensors psum over 'seq'; Viterbi runs on the reduced
    tensors per window shard."""

    def step(masks_shard, pos_shard):
        win = design_scan.patch_windows(masks_shard, pos_shard, plen)
        stats = design_scan.window_stats(win, variation)
        stats = {k: jax.lax.psum(v, "seq") for k, v in stats.items()}
        stats["viterbi"] = design_scan.viterbi_batch(stats["freq"],
                                                     stats["nn"])
        return stats

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("seq", None), P("win")),
        out_specs={"freq": P("win"), "nn": P("win"),
                   "cover_number": P("win"), "gap_number": P("win"),
                   "viterbi": P("win")})
    return jax.jit(fn)(masks, positions)


_STAGE_A_CACHE = {}


def _stage_a_full_fn(mesh, plen, variation):
    """Compiled shard-mapped design_stats_full: masks over 'seq', windows
    over 'win'; freq/NN/count tensors psum over 'seq'; the patched windows
    themselves stay sharded over both axes and gather only on fetch."""
    key = (id(mesh), plen, variation)
    fn = _STAGE_A_CACHE.get(key)
    if fn is not None:
        return fn

    def step(masks_shard, pos_shard):
        win = design_scan.patch_windows(masks_shard, pos_shard, plen)
        stats = design_scan.window_stats(win, variation)
        stats = {k: jax.lax.psum(v, "seq") for k, v in stats.items()}
        stats["viterbi"] = design_scan.viterbi_batch(stats["freq"],
                                                     stats["nn"])
        stats["win"] = win.astype(jnp.int8)
        return stats

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("seq", None), P("win")),
        out_specs={"freq": P("win"), "nn": P("win"),
                   "cover_number": P("win"), "gap_number": P("win"),
                   "viterbi": P("win"), "win": P("seq", "win")}))
    if len(_STAGE_A_CACHE) >= 16:
        _STAGE_A_CACHE.pop(next(iter(_STAGE_A_CACHE)))
    _STAGE_A_CACHE[key] = fn
    return fn


def design_stats_blocks_sharded(mesh, masks, positions, *, plen=18,
                                variation=1, block=512):
    """Multi-chip drop-in for ops.design_scan.design_stats_blocks: same
    (pos_block, stats_numpy) stream, windows sharded over 'win' and MSA rows
    over 'seq'.

    Sequence rows are padded to a multiple of the 'seq' axis with all-gap
    rows.  An all-gap row contributes exactly +1 to every window's
    gap_number and nothing to freq/nn/cover_number (window_stats: a 0-mask
    window has plen gaps > variation), so the host subtracts the pad count
    from gap_number and drops the pad rows of the patched-window tensor —
    making the stream bit-identical to the single-device one
    (tests/test_parallel.py)."""
    masks = np.ascontiguousarray(masks, dtype=np.int32)
    positions = np.asarray(positions, dtype=np.int32)
    n_real = masks.shape[0]
    seq_shards = mesh.shape["seq"]
    win_shards = mesh.shape["win"]
    if block % win_shards:
        block += win_shards - block % win_shards
    n_pad = -n_real % seq_shards
    if n_pad:
        masks = np.concatenate(
            [masks, np.zeros((n_pad, masks.shape[1]), np.int32)])
    fn = _stage_a_full_fn(mesh, plen, variation)
    for b0 in range(0, len(positions), block):
        pos = positions[b0:b0 + block]
        w_real = len(pos)
        if w_real < block:
            pos = np.concatenate(
                [pos, np.full(block - w_real, pos[-1], np.int32)])
        out = {k: np.asarray(v) for k, v in fn(masks, pos).items()}
        if n_pad:
            out["gap_number"] = out["gap_number"] - n_pad
            out["win"] = out["win"][:n_real]
        if w_real < block:
            out = {k: (v[:, :w_real] if k == "win" else v[:w_real])
                   for k, v in out.items()}
        yield positions[b0:b0 + block], out


def coverage_counts_sharded(mesh, targets_1h, lengths, primers_1h, suffix_1h,
                            *, mm=1, term=4):
    """Multi-chip coverage scan: targets sharded over ('seq','win') flattened
    as one data axis, primers broadcast; per-primer hit/coverage counts merge
    with psum over both axes."""

    def step(t_shard, len_shard, p, s):
        counts = mismatch_scan.match_counts_conv(t_shard, p)
        suffix = mismatch_scan.match_counts_conv(t_shard, s)
        plen = p.shape[1]
        n_out = counts.shape[1]
        ok = ((plen - counts) <= mm) & (suffix >= term)
        o_idx = jnp.arange(n_out)[None, :, None]
        ok &= (o_idx + plen) <= len_shard[:, None, None]
        per_primer_hits = jnp.sum(ok, axis=(0, 1))
        covered_seqs = jnp.sum(jnp.any(ok, axis=(1, 2)))
        per_primer_hits = jax.lax.psum(
            jax.lax.psum(per_primer_hits, "seq"), "win")
        covered_seqs = jax.lax.psum(
            jax.lax.psum(covered_seqs, "seq"), "win")
        return per_primer_hits, covered_seqs

    n_shards = mesh.devices.size
    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P(("seq", "win")), P(("seq", "win")), P(None, None, None),
                  P(None, None, None)),
        out_specs=(P(), P()))
    return jax.jit(fn)(targets_1h, lengths, primers_1h, suffix_1h)


# -- sparse sharded scan ------------------------------------------------------
#
# The production coverage validation needs the sparse (gene, pos, primer)
# hits for the F x R product join (primer_coverage_validation_by_BWT.py:
# 303-342), not just psum'd counts.  Each shard thresholds its own target
# rows and compacts hits to a fixed-size packed block on device; the blocks
# gather back over the flattened ('seq','win') axis (pure data parallelism —
# the only "collective" is the output gather), and the host decodes each
# block with its shard's global row offset.

_ACTIVE_MESH = None


def active_mesh():
    return _ACTIVE_MESH


class use_mesh:
    """Context manager routing validate.scan through find_hits_sharded."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        global _ACTIVE_MESH
        self._prev = _ACTIVE_MESH
        _ACTIVE_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_MESH
        _ACTIVE_MESH = self._prev
        return False


_SHARDED_SCAN_CACHE = {}


def _sharded_scan_fn(mesh, mm, term, max_hits, want_mism):
    key = (id(mesh), mm, term, max_hits, want_mism)
    fn = _SHARDED_SCAN_CACHE.get(key)
    if fn is not None:
        return fn

    def step(t_shard, len_shard, p, s):
        return mismatch_scan.find_hits_packed.__wrapped__(
            t_shard, len_shard, p, s, mm=mm, term=term,
            max_hits=max_hits, backend="conv", want_mism=want_mism)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(("seq", "win")), P(("seq", "win")),
                  P(None, None, None), P(None, None, None)),
        out_specs=P(("seq", "win"))))
    # bound the cache: fresh Mesh objects / max_hits retry-doubling would
    # otherwise accumulate compiled executables for the process lifetime
    if len(_SHARDED_SCAN_CACHE) >= 16:
        _SHARDED_SCAN_CACHE.pop(next(iter(_SHARDED_SCAN_CACHE)))
    _SHARDED_SCAN_CACHE[key] = fn
    return fn


def find_hits_sharded(mesh, targets, lengths, primers_1h, suffix_1h, *,
                      mm=1, term=4, max_hits_per_shard=1 << 18,
                      want_mism=False):
    """Multi-chip sparse scan.  targets: [N, L] 4-bit masks (or [N, L, 4]
    one-hot) with N divisible by the mesh size; primers broadcast.

    -> list of per-shard packed int32 blocks (find_hits_packed layout);
    decode shard i with global row offset i * (N // n_shards).
    """
    n_shards = mesh.devices.size
    n = targets.shape[0]
    if n % n_shards:
        raise ValueError("N=%d not divisible by %d shards" % (n, n_shards))
    fn = _sharded_scan_fn(mesh, mm, term, max_hits_per_shard, want_mism)
    packed = np.asarray(fn(targets, lengths, primers_1h, suffix_1h))
    return packed.reshape(n_shards, -1)


def full_design_step(mesh, masks, positions, targets_1h, lengths, primers_1h,
                     suffix_1h, *, plen=18, variation=1, mm=1, term=4):
    """One fused multi-chip "design step": Stage-A stats + consensus over the
    MSA shard plus a coverage scan of candidate primers over the target
    shard.  This is the graft-entry dryrun payload — it exercises psum over
    'seq', data-parallel windows over 'win', and broadcast primers."""
    stats = design_stats_sharded(mesh, masks, positions, plen=plen,
                                 variation=variation)
    hits, covered = coverage_counts_sharded(
        mesh, targets_1h, lengths, primers_1h, suffix_1h, mm=mm, term=term)
    return stats, hits, covered
