"""Mismatch-tolerant primer-vs-target scan — the framework's hot kernel.

Replaces the reference's bowtie2 + samtools + MD-tag pipeline
(/root/reference/scripts/primer_coverage_validation_by_BWT.py:264-301) with an
exhaustive on-device scan: expanded primers (one-hot [P, l, 4]) are correlated
against target sequences (one-hot [N, L, 4]); a window is a hit when

    total mismatches <= mm   AND   no mismatch in the 3'-terminal `term` bases

which is exactly the reference's MD-tag trailing-run filter (:242-262) —
"reject when the last exact-match run is shorter than term" is equivalent to
"any mismatch within the last term bases" for primer-scale lengths.

Two backends:

* ``match_counts_conv`` — XLA conv_general_dilated (one-hot as 4 input
  channels, primers as P output channels).  XLA lowers this to MXU convs,
  but `find_hits` on top of it materialises two f32 [N, O, P] count tensors
  in HBM (total + 3'-suffix) before thresholding — the scan is
  bandwidth-bound, not FLOP-bound (0.04 TMACs vs ~4 GB of traffic at the
  bench shape), so those round-trips dominate.
* ``hit_codes_pallas`` — fused Pallas kernel: per (seq-tile, window-tile)
  grid cell, im2col into VMEM scratch, ONE [TO, l*4] x [l*4, 2P] MXU matmul
  (primer and 3'-suffix one-hots side by side), and the mm/term threshold
  applied in VMEM.  Only an int8 hit-code tensor (0 = miss, mism+1 = hit)
  ever reaches HBM — 1/16th of the conv path's traffic.

Both backends yield identical hits (0/1 products, f32 accumulation is
exact).  `find_hits` thresholds on device and returns sparse hit coordinates.

Sharding: the N (sequence) axis is embarrassingly parallel — see
multiprime_tpu.parallel.scan_sharded for the psum-reduced multi-chip wrapper.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import iupac

# popcount of the 4-bit IUPAC masks: 1 <=> unambiguous base
_POP4 = np.array([bin(i).count("1") for i in range(16)], dtype=np.int32)


def encode_targets(seqs, length=None):
    """List of ACGT/N strings -> (one-hot uint8 [N, L, 4], lengths [N])."""
    if length is None:
        length = max((len(s) for s in seqs), default=0)
    n = len(seqs)
    chars = np.zeros((n, length), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = np.frombuffer(s.encode("ascii"), np.uint8)[:length]
        chars[i, :len(b)] = b
        lengths[i] = len(b)
    masks = iupac.bytes_to_masks(chars)
    onehot = ((masks[..., None] >> np.arange(4)[None, None, :]) & 1)
    # Ambiguity codes in targets match nothing (bowtie-like): zero them out.
    pure = np.isin(masks, [1, 2, 4, 8])
    onehot = onehot * pure[..., None]
    return onehot.astype(np.uint8), lengths


def encode_target_masks(seqs, length=None):
    """List of strings -> (IUPAC 4-bit masks uint8 [N, L], lengths [N]).

    The compact upload format: 1/4 the bytes of the one-hot encoding.  On
    high-latency or narrow host->device links (the usual production
    bottleneck — the scan itself is bandwidth-bound, not FLOP-bound) ship
    THIS and let find_hits expand on device."""
    if length is None:
        length = max((len(s) for s in seqs), default=0)
    n = len(seqs)
    chars = np.zeros((n, length), dtype=np.uint8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        b = np.frombuffer(s.encode("ascii"), np.uint8)[:length]
        chars[i, :len(b)] = b
        lengths[i] = len(b)
    return iupac.bytes_to_masks(chars), lengths


def encode_target_codes(seqs, length=None):
    """List of strings -> (STRICT 4-bit codes uint8 [N, L], lengths [N]):
    pure bases keep their bit, ambiguity codes/gaps/padding become 0 (match
    nothing) — the mask-scan form of encode_targets' purity zeroing."""
    masks, lengths = encode_target_masks(seqs, length)
    pure = np.isin(masks, [1, 2, 4, 8])
    return np.where(pure, masks, 0).astype(np.uint8), lengths


def encode_pattern_masks(patterns):
    """List of (possibly degenerate) equal-length patterns -> uint8
    [P, plen] IUPAC member masks; unknown characters map to 0 = always a
    mismatch, like encode_primers' zero one-hot rows."""
    arr = np.stack([
        np.frombuffer(p.encode("ascii"), np.uint8) for p in patterns])
    return iupac.bytes_to_masks(arr)


def expand_masks(masks):
    """Device-side: uint8 [N, L] IUPAC masks -> one-hot uint8 [N, L, 4];
    ambiguity codes in targets match nothing (bowtie-like), same semantics
    as encode_targets."""
    m = jnp.asarray(masks).astype(jnp.int32)
    onehot = (m[..., None] >> jnp.arange(4, dtype=jnp.int32)) & 1
    pure = jnp.asarray(_POP4)[m] == 1
    return jnp.where(pure[..., None], onehot, 0).astype(jnp.uint8)


def encode_primers(primers):
    """List of expanded (pure ACGT) primers of equal length -> one-hot
    uint8 [P, l, 4]."""
    arr = np.stack([
        np.frombuffer(p.encode("ascii"), np.uint8) for p in primers])
    masks = iupac.bytes_to_masks(arr)
    onehot = ((masks[..., None] >> np.arange(4)[None, None, :]) & 1)
    return onehot.astype(np.uint8)


# ---------------------------------------------------------------------------
# XLA conv backend
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("precision",))
def match_counts_conv(targets_1h, primers_1h, precision=None):
    """[N, L, 4] x [P, l, 4] -> match counts f32 [N, L-l+1, P]."""
    lhs = targets_1h.astype(jnp.bfloat16)           # N, L, 4  (NWC)
    rhs = primers_1h.astype(jnp.bfloat16)           # P, l, 4  (OWI)
    dn = jax.lax.conv_dimension_numbers(
        lhs.shape, rhs.shape, ("NWC", "OWI", "NWC"))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return out                                       # N, O, P


# ---------------------------------------------------------------------------
# Pallas backend
# ---------------------------------------------------------------------------

def _scan_kernel(x_ref, w_ref, o_ref, acc_ref, *, tile_o, plen):
    """One grid cell: base planes [TN, 4, Lp] -> counts [TN, TO, P].

    Windows overlap by plen-1 (inexpressible as block-index maps), so the
    full sequence rows sit in VMEM with positions on the lane axis; im2col
    lands in a [TN, 4*plen, TO] scratch (contraction dim on sublanes, already
    the transposed-lhs layout the MXU wants), then one dot_general against
    the [4*plen, P] primer matrix.
    """
    j = pl.program_id(1)
    base = pl.multiple_of(j * tile_o, 256)
    pad = 128  # aligned over-read that covers the plen-1 window overlap
    for b in range(4):
        row = x_ref[:, b, pl.ds(base, tile_o + pad)]
        for k in range(plen):
            acc_ref[:, b * plen + k, :] = row[:, k:k + tile_o]
    counts = jax.lax.dot_general(
        acc_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = counts


def _hit_code_kernel(x_ref, w_ref, o_ref, acc_ref, *, tile_o, plen,
                     mm, term):
    """Fused scan: im2col + two [.., 4*plen] x [4*plen, TP] MXU matmuls
    (total-match and 3'-suffix counts) + threshold, emitting int8 codes
    (0 = no hit, mismatches+1 = hit).  The f32 count tensors never leave
    VMEM.  The primer axis is grid-tiled (w_ref holds one TP-column slab of
    both weight sets) so large pattern sets stay inside the VMEM budget."""
    j = pl.program_id(1)
    base = pl.multiple_of(j * tile_o, 256)
    pad = 128  # aligned over-read that covers the plen-1 window overlap
    block = x_ref[:, :, pl.ds(base, tile_o + pad)]   # [TN, 4, TO+pad]
    # One lane-shift per window offset, all 4 base planes at once; the
    # contraction axis is (position-major, base-minor), matching w.
    for k in range(plen):
        acc_ref[:, pl.ds(4 * k, 4), :] = block[:, :, k:k + tile_o]
    counts = jax.lax.dot_general(
        acc_ref[:], w_ref[:, 0, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # [TN, TO, TP], int8 MXU
    suffix = jax.lax.dot_general(
        acc_ref[:], w_ref[:, 1, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    mism = plen - counts
    ok = (mism <= mm) & (suffix >= term)
    o_ref[:] = jnp.where(ok, mism + 1, 0).astype(jnp.int8)


def match_counts_pallas(targets_1h, primers_1h, tile_n=8, tile_o=512,
                        interpret=False):
    """Pallas implementation of match_counts_conv (identical values)."""
    n, length, _ = targets_1h.shape
    p, plen, _ = primers_1h.shape
    n_out = length - plen + 1
    # Pad so the grid tiles evenly; padded windows are discarded by caller.
    n_pad = -n % tile_n
    o_pad = -n_out % tile_o
    # Base-plane layout [N, 4, L]: positions on the lane axis.
    x = jnp.transpose(jnp.asarray(targets_1h, jnp.bfloat16), (0, 2, 1))
    # o_pad tail + 128 so the kernel's aligned over-read stays in bounds.
    x = jnp.pad(x, ((0, n_pad), (0, 0), (0, o_pad + 128 + plen)))
    # Primer matrix [4*plen, P] with the same (base-major, position-minor)
    # contraction order as the scratch fill.
    w = jnp.transpose(jnp.asarray(primers_1h, jnp.bfloat16), (2, 1, 0)) \
        .reshape(4 * plen, p)
    grid = ((n + n_pad) // tile_n, (n_out + o_pad) // tile_o)
    out = pl.pallas_call(
        functools.partial(_scan_kernel, tile_o=tile_o, plen=plen),
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, n_out + o_pad, p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 4, x.shape[2]), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * plen, p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_o, p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_n, 4 * plen, tile_o), jnp.bfloat16)],
        interpret=interpret,
    )(x, w)
    return out[:n, :n_out, :]


# ---------------------------------------------------------------------------
# Hit extraction
# ---------------------------------------------------------------------------

def hit_codes_pallas(targets_1h, primers_1h, suffix_1h, *, mm, term,
                     tile_n=8, tile_o=512, tile_p=512, interpret=False):
    """One fused Pallas pass -> int8 hit codes [N, O, P]
    (0 = no hit, mismatches+1 = hit under the mm/term rule).

    Grid (seq-tiles, window-tiles, primer-tiles): the primer axis is tiled
    so thousand-pattern panels fit the VMEM budget (out block TN*TO*TP int8
    + one TP weight slab, ~2.2 MB at defaults)."""
    n, length, _ = targets_1h.shape
    p, plen, _ = primers_1h.shape
    n_out = length - plen + 1
    n_pad = -n % tile_n
    o_pad = -n_out % tile_o
    tile_p = min(tile_p, max(128, 1 << (p - 1).bit_length()))
    if p > tile_p:
        # two int32 count intermediates live per grid cell
        # (tile_n*tile_o*tile_p*4 bytes each) — halve the window tile to
        # stay inside the 16 MB scoped-VMEM budget at full primer tiles
        tile_o = min(tile_o, 256)
    p_pad = -p % tile_p
    x = jnp.transpose(jnp.asarray(targets_1h, jnp.int8), (0, 2, 1))
    x = jnp.pad(x, ((0, n_pad), (0, 0), (0, o_pad + 128 + plen)))
    # [4*plen, 2, P]: position-major / base-minor rows (matching the
    # kernel's im2col fill order); plane 0 = total-match weights, plane 1 =
    # 3'-suffix weights, so a primer-tile block slices both coherently.
    w = jnp.stack([
        jnp.transpose(jnp.asarray(primers_1h, jnp.int8), (1, 2, 0))
           .reshape(4 * plen, p),
        jnp.transpose(jnp.asarray(suffix_1h, jnp.int8), (1, 2, 0))
           .reshape(4 * plen, p)], axis=1)
    if p_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, p_pad)))
    grid = ((n + n_pad) // tile_n, (n_out + o_pad) // tile_o,
            (p + p_pad) // tile_p)
    out = pl.pallas_call(
        functools.partial(_hit_code_kernel, tile_o=tile_o, plen=plen,
                          mm=mm, term=term),
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, n_out + o_pad, p + p_pad), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 4, x.shape[2]), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * plen, 2, tile_p), lambda i, j, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_o, tile_p),
                               lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_n, 4 * plen, tile_o), jnp.int8)],
        interpret=interpret,
    )(x, w)
    return out[:n, :n_out, :p]


def hit_codes_conv(targets_1h, primers_1h, suffix_1h, *, mm, term):
    """ONE conv + fused epilogue -> int8 hit codes [N, O, P].

    The total-match and 3'-suffix conditions fold into a single weight set
    ``primers + W*suffix`` (W=64 > plen): score = counts + W*suffix_counts,
    and since counts < W the pair is uniquely decodable —
    ``score >= W*term + plen - mm``  <=>  suffix clean AND mism <= mm, with
    mism = plen - (score - W*term).  One conv instead of two, and the
    int8-code epilogue fuses into it, so the f32 counts never reach HBM."""
    plen = primers_1h.shape[1]
    w = 64
    assert plen < w and mm < w
    combined = (primers_1h.astype(jnp.bfloat16)
                + w * suffix_1h.astype(jnp.bfloat16))
    score = match_counts_conv.__wrapped__(targets_1h, combined)
    thresh = w * term + plen - mm
    mism = plen - (score - w * term)
    return jnp.where(score >= thresh, mism + 1, 0).astype(jnp.int8)


def _bitmap_kernel(x_ref, w_ref, o_ref, acc_ref, *, tile_o, plen, mm,
                   term, n_ptiles):
    """Fused scan emitting ONLY the per-window any-hit bitmap [TN, TO]
    (OR over the primer axis, accumulated across the primer-tile grid
    axis).  The [TN, TO, TP] verdict tensor lives and dies in VMEM/regs —
    HBM sees N*O bytes instead of N*O*P (the r4 roofline's
    materialisation wall, DESIGN.md).  Exact hit tuples are recovered by
    re-matching just the flagged windows (find_hits_bitmap)."""
    j = pl.program_id(1)
    k = pl.program_id(2)
    base = pl.multiple_of(j * tile_o, 256)
    pad = 128

    # the primer-tile axis is innermost (row-major grid order) and the
    # scratch persists across grid steps: the im2col only depends on
    # (i, j), so rebuild it once per window tile, not once per cell
    @pl.when(k == 0)
    def _im2col():
        block = x_ref[:, :, pl.ds(base, tile_o + pad)]
        for kk in range(plen):
            acc_ref[:, pl.ds(4 * kk, 4), :] = block[:, :, kk:kk + tile_o]

    counts = jax.lax.dot_general(
        acc_ref[:], w_ref[:, 0, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    suffix = jax.lax.dot_general(
        acc_ref[:], w_ref[:, 1, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    ok = ((plen - counts) <= mm) & (suffix >= term)
    # int max-reduce instead of bool any: Mosaic rejects the i1 relayout
    any_hit = jnp.max(jnp.where(ok, 1, 0), axis=2).astype(jnp.int8)
    if n_ptiles == 1:
        o_ref[:] = any_hit
    else:
        @pl.when(k == 0)
        def _init():
            o_ref[:] = any_hit

        @pl.when(k > 0)
        def _accum():
            o_ref[:] = o_ref[:] | any_hit


def hit_window_bitmap_pallas(targets_1h, primers_1h, suffix_1h, *, mm,
                             term, tile_n=8, tile_o=512, tile_p=512,
                             interpret=False):
    """Fused Pallas pass -> int8 any-hit bitmap [N, O] (1 iff some primer
    hits that (seq, window) under the mm/term rule)."""
    n, length, _ = targets_1h.shape
    p, plen, _ = primers_1h.shape
    n_out = length - plen + 1
    n_pad = -n % tile_n
    o_pad = -n_out % tile_o
    tile_p = min(tile_p, max(128, 1 << (p - 1).bit_length()))
    if p > tile_p:
        tile_o = min(tile_o, 256)
    p_pad = -p % tile_p
    x = jnp.transpose(jnp.asarray(targets_1h, jnp.int8), (0, 2, 1))
    x = jnp.pad(x, ((0, n_pad), (0, 0), (0, o_pad + 128 + plen)))
    w = jnp.stack([
        jnp.transpose(jnp.asarray(primers_1h, jnp.int8), (1, 2, 0))
           .reshape(4 * plen, p),
        jnp.transpose(jnp.asarray(suffix_1h, jnp.int8), (1, 2, 0))
           .reshape(4 * plen, p)], axis=1)
    if p_pad:
        # padded primer columns are all-zero one-hots: mism = plen > mm,
        # so they never flag a window
        w = jnp.pad(w, ((0, 0), (0, 0), (0, p_pad)))
    n_ptiles = (p + p_pad) // tile_p
    grid = ((n + n_pad) // tile_n, (n_out + o_pad) // tile_o, n_ptiles)
    out = pl.pallas_call(
        functools.partial(_bitmap_kernel, tile_o=tile_o, plen=plen,
                          mm=mm, term=term, n_ptiles=n_ptiles),
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, n_out + o_pad), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 4, x.shape[2]), lambda i, j, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * plen, 2, tile_p), lambda i, j, k: (0, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_o), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_n, 4 * plen, tile_o), jnp.int8)],
        interpret=interpret,
    )(x, w)
    return out[:n, :n_out]


@functools.partial(jax.jit, static_argnames=("mm", "term", "backend"))
def hit_window_bitmap(targets_1h, lengths, primers_1h, suffix_1h, *, mm=1,
                      term=4, backend="pallas"):
    """Any-hit window bitmap [N, O] int8 with the in-sequence length mask
    applied.  backend="conv" reduces the dense conv codes (XLA decides the
    fusion); "pallas" never materialises the [N, O, P] tensor."""
    if targets_1h.ndim == 2:
        targets_1h = expand_masks(targets_1h)
    plen = primers_1h.shape[1]
    if backend == "pallas":
        bm = hit_window_bitmap_pallas(targets_1h, primers_1h, suffix_1h,
                                      mm=mm, term=term)
    else:
        codes = hit_codes_conv(targets_1h, primers_1h, suffix_1h,
                               mm=mm, term=term)
        bm = jnp.any(codes > 0, axis=2).astype(jnp.int8)
    o_idx = jnp.arange(bm.shape[1], dtype=jnp.int32)[None, :]
    return jnp.where((o_idx + plen) <= lengths[:, None], bm, 0)


def find_hits_bitmap(targets_1h_np, lengths_np, primers_1h_np,
                     suffix_1h_np, *, mm=1, term=4, backend="pallas"):
    """Two-phase sparse scan: device any-hit bitmap (N*O bytes of HBM
    traffic instead of N*O*P) + host re-match of just the flagged windows.
    Returns (seq, window, primer, mism) int arrays in the same ascending
    (n, o, p) order as find_hits/decode_hits.  Exact: phase B re-applies
    the identical mm/term rule per flagged window."""
    bm = np.asarray(hit_window_bitmap(
        jnp.asarray(targets_1h_np), jnp.asarray(lengths_np),
        jnp.asarray(primers_1h_np), jnp.asarray(suffix_1h_np),
        mm=mm, term=term, backend=backend))
    ns, os_ = np.nonzero(bm)
    if len(ns) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z.astype(np.int32)
    plen = primers_1h_np.shape[1]
    p = primers_1h_np.shape[0]
    # gather the flagged windows: [H, plen, 4]
    win = np.stack([targets_1h_np[n, o:o + plen] for n, o in zip(ns, os_)])
    wmat = win.reshape(len(ns), plen * 4).astype(np.float32)
    weights = np.concatenate([primers_1h_np, suffix_1h_np], axis=0) \
        .reshape(2 * p, plen * 4).astype(np.float32).T
    acc = wmat @ weights                                  # [H, 2P]
    counts = acc[:, :p].astype(np.int32)
    sfx = acc[:, p:].astype(np.int32)
    mism = plen - counts
    ok = (mism <= mm) & (sfx >= term)
    h, pi = np.nonzero(ok)
    return (ns[h].astype(np.int64), os_[h].astype(np.int64),
            pi.astype(np.int64), mism[h, pi].astype(np.int32))


# level-1 compaction block length: per-block any/count stats shrink the
# nonzero problem by 64x before the exact index extraction
_BLK = 64


@functools.partial(jax.jit,
                   static_argnames=("mm", "term", "max_hits", "backend"))
def find_hits(targets_1h, lengths, primers_1h, suffix_1h, *, mm=1, term=4,
              max_hits=1 << 18, backend="conv"):
    """Sparse scan: -> (hit_idx [max_hits], n_hits, mismatches [max_hits]).

    hit_idx encodes n * (O * P) + o * P + p; -1 padding, ascending, first
    max_hits hits.  suffix_1h is the primer one-hot with everything but the
    3'-terminal `term` positions zeroed (suffix mismatches must be 0).

    targets_1h may be either the one-hot [N, L, 4] or the compact
    [N, L] 4-bit mask form (expanded on device — preferred for uploads).

    Extraction is a two-level compaction: a flat nonzero over the [N,O,P]
    hit tensor costs a full int32 cumsum round-trip (~8x the code bytes),
    so instead per-64-element block any/count stats are reduced in the same
    pass that reads the codes, the (sparse) nonempty blocks are compacted
    and gathered, and the exact nonzero runs on max_hits*64 candidates
    only.  Capture guarantee: <= max_hits true hits occupy <= max_hits
    blocks, and blocks/offsets are enumerated ascending, so the result
    equals the flat nonzero's first-max_hits-ascending contract exactly.
    """
    if targets_1h.ndim == 2:
        targets_1h = expand_masks(targets_1h)
    plen = primers_1h.shape[1]
    if backend == "pallas":
        codes = hit_codes_pallas(targets_1h, primers_1h, suffix_1h,
                                 mm=mm, term=term)
    else:
        codes = hit_codes_conv(targets_1h, primers_1h, suffix_1h,
                               mm=mm, term=term)
    n, n_out, p = codes.shape
    # windows must lie inside the real sequence
    o_idx = jnp.arange(n_out, dtype=jnp.int32)[None, :, None]
    codes = jnp.where((o_idx + plen) <= lengths[:, None, None], codes, 0)

    total = n * n_out * p
    pad = -total % _BLK
    flat = codes.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, jnp.int8)])
    blocks = flat.reshape(-1, _BLK)                  # [NB, 64]
    hit = blocks > 0
    blk_cnt = jnp.sum(hit, axis=1, dtype=jnp.int32)  # [NB]
    n_hits = jnp.sum(blk_cnt)
    blk_idx = jnp.nonzero(blk_cnt > 0, size=max_hits, fill_value=-1)[0]
    gathered = blocks[jnp.maximum(blk_idx, 0)]       # [max_hits, 64] int8
    valid = (blk_idx >= 0)[:, None] & (gathered > 0)
    # global flat indices, monotone over (block, offset) — stays ascending
    gidx = (blk_idx[:, None].astype(jnp.int32) * _BLK
            + jnp.arange(_BLK, dtype=jnp.int32)[None, :])
    pos = jnp.nonzero(valid.reshape(-1), size=max_hits, fill_value=-1)[0]
    idx = jnp.where(pos >= 0, gidx.reshape(-1)[jnp.maximum(pos, 0)], -1)
    mism_flat = jnp.where(
        pos >= 0,
        gathered.reshape(-1)[jnp.maximum(pos, 0)].astype(jnp.int32) - 1, -1)
    return idx, n_hits, mism_flat


@functools.partial(jax.jit,
                   static_argnames=("mm", "term", "max_hits", "backend",
                                    "want_mism"))
def find_hits_packed(targets_1h, lengths, primers_1h, suffix_1h, *, mm=1,
                     term=4, max_hits=1 << 18, backend="conv",
                     want_mism=True):
    """find_hits with everything packed into ONE int32 array so callers pay a
    single device->host transfer: out[0] = n_hits, out[1:max_hits+1] = flat
    hit indices (-1 padding), out[max_hits+1:] = mismatch counts.  On
    high-latency device links each fetch costs ~seconds, so one round-trip
    instead of three matters more than the bytes.

    Caller contract: N * O * P must stay below 2**31 (JAX's default x64-off
    mode truncates int64) — use safe_batch_size().
    """
    idx, n_hits, mism_flat = find_hits.__wrapped__(
        targets_1h, lengths, primers_1h, suffix_1h, mm=mm, term=term,
        max_hits=max_hits, backend=backend)
    parts = [n_hits[None].astype(jnp.int32), idx.astype(jnp.int32)]
    if want_mism:
        parts.append(mism_flat.astype(jnp.int32))
    return jnp.concatenate(parts)


@functools.partial(jax.jit,
                   static_argnames=("mm", "term", "max_hits", "backend",
                                    "want_mism"))
def find_hits_batched(targets_masks, lengths, primers_1h, suffix_1h, *,
                      mm=1, term=4, max_hits=1 << 17, backend="conv",
                      want_mism=False):
    """The whole corpus in ONE dispatch: lax.scan over pre-batched 4-bit
    mask rows [B, bs, L] -> packed hit blocks [B, 1 + max_hits (+max_hits)].

    Rationale: on high-latency device links every dispatch->fetch round
    trip costs ~1-2 s regardless of compute (measured; and
    block_until_ready through the tunnel returns early, so the cost shows
    up at the fetch).  A 21k-seq corpus at the memory-safe batch size is
    ~53 batches = ~90 s of round trips.  Scanning the batches INSIDE one
    executable and fetching one [B, max_hits] block pays the round trip
    once; the per-batch codes tensor stays transient in HBM.
    """
    def body(_, xs):
        t, l = xs
        packed = find_hits_packed.__wrapped__(
            t, l, primers_1h, suffix_1h, mm=mm, term=term,
            max_hits=max_hits, backend=backend, want_mism=want_mism)
        return 0, packed

    _, packs = jax.lax.scan(body, 0, (targets_masks, lengths))
    return packs


def safe_batch_size(requested, n_out, p, mem_bytes=3 << 30):
    """Largest batch <= requested keeping (a) the flat index space under
    2**31 (jax x64 is off: bigger silently truncates, dropping hits) and
    (b) one [N, n_out, p] f32 count tensor under ``mem_bytes`` (the scan
    keeps ~3 such intermediates live — total + suffix counts + hit mask —
    so 3 GiB per tensor stays well inside a 16 GiB-HBM chip)."""
    cap = max(1, ((1 << 31) - 1) // max(n_out * p, 1))
    mem_cap = max(1, int(mem_bytes) // max(4 * n_out * p, 1))
    return max(1, min(requested, cap, mem_cap))


def decode_packed(packed, n_out, p, max_hits):
    """Host-side decode of find_hits_packed output (with or without the
    mismatch block)."""
    packed = np.asarray(packed)
    n_hits = int(packed[0])
    idx = packed[1:max_hits + 1].astype(np.int64)
    has_mism = len(packed) > max_hits + 1
    mism_blk = packed[max_hits + 1:] if has_mism else None
    keep = idx >= 0
    idx = idx[keep]
    mism = mism_blk[keep] if has_mism else np.zeros(len(idx), np.int32)
    seq = idx // (n_out * p)
    rem = idx % (n_out * p)
    return seq, rem // p, rem % p, mism.astype(np.int32), n_hits


def find_hits_numpy(targets_1h, lengths, primers_1h, suffix_1h, *, mm=1,
                    term=4):
    """Pure NumPy scan for small workloads (identical hits).  Correlation via
    einsum over uint8 one-hots; avoids device compile latency when
    N*O*P is tiny relative to the compile cost."""
    n, length, _ = targets_1h.shape
    p, plen, _ = primers_1h.shape
    n_out = length - plen + 1
    if n_out <= 0:
        return np.empty((0, 4), np.int64)
    # One sgemm over the f32 im2col: [chunk*O, 4*plen] x [4*plen, 2P]
    # (primer and 3'-suffix weights side by side).  BLAS with K = 4*plen
    # beats einsum's two int32 [N, O, 4, plen] materialisations ~8x; match
    # counts are small ints, exact in f32.  Rows are chunked to bound the
    # im2col + accumulator working set.
    weights = np.concatenate([primers_1h, suffix_1h], axis=0).reshape(
        2 * p, plen * 4).astype(np.float32).T       # [4*plen, 2P]
    per_row = n_out * (4 * plen * 4 + 8 * p)        # bytes per target row
    chunk = max(1, min(n, (512 << 20) // max(per_row, 1)))
    out = []
    o_idx = np.arange(n_out)[None, :, None]
    for base in range(0, n, chunk):
        tc = targets_1h[base:base + chunk]
        win = np.lib.stride_tricks.sliding_window_view(
            tc, plen, axis=1)                       # [C, O, 4, plen]
        col = np.ascontiguousarray(
            win.transpose(0, 1, 3, 2), dtype=np.float32).reshape(
                -1, plen * 4)
        acc = (col @ weights).reshape(len(tc), n_out, 2 * p)
        counts = acc[:, :, :p].astype(np.int32)
        suffix = acc[:, :, p:].astype(np.int32)
        mism = plen - counts
        ok = (mism <= mm) & (suffix >= term)
        ok &= (o_idx + plen) <= lengths[base:base + chunk, None, None]
        s, o, pi = np.nonzero(ok)
        out.append(np.stack([s + base, o, pi, mism[s, o, pi]], axis=1))
    if not out:
        return np.empty((0, 4), np.int64)
    return out[0] if len(out) == 1 else np.concatenate(out, axis=0)


def decode_hits(idx, mism, n_out, p):
    """Host-side: flat indices -> (seq, window, primer, mismatches) arrays."""
    idx = np.asarray(idx)
    keep = idx >= 0
    idx = idx[keep]
    mism = np.asarray(mism)[keep]
    seq = idx // (n_out * p)
    rem = idx % (n_out * p)
    return seq, rem // p, rem % p, mism.astype(np.int32)
