"""Host<->device link probe feeding the backend auto policies.

Round 2 hard-coded its backend verdicts from measurements taken through a
23 ms-RTT tunneled chip ("the host owns every mm<=3 workload").  Those
verdicts explained that box, not the hardware: on a direct-attached v5e the
transfer term collapses by ~3 orders of magnitude and the crossovers move.
This module makes the policies environment-aware instead:

* ``probe()`` measures the actual link ONCE per machine — upload/download
  bandwidth (one mid-size transfer each way) and round-trip latency (tiny
  transfers) — and caches the result on disk keyed by device platform, so
  every later process pays nothing.
* the auto policies (validate/scan.py, models/mcdpd.py) combine the probe
  with measured compute-rate constants (see ``RATES``) into explicit
  time estimates; the cheaper side wins.  The formulae are documented in
  DESIGN.md ("Backend crossover model").

Escape hatches:

* ``MPTPU_FORCE_BACKEND=host|device`` overrides every auto policy
  (host = native/NumPy paths, device = the JAX kernels);
* ``MPTPU_LINK_UP_MBPS`` / ``MPTPU_LINK_DOWN_MBPS`` / ``MPTPU_LINK_RTT_MS``
  inject link numbers without probing (also how tests pin both policy
  branches deterministically);
* ``MPTPU_LINK_PROBE=0`` disables measurement: the policy then assumes the
  pessimistic tunnel link (device never auto-selected).
"""

from __future__ import annotations

import json
import os
import time

# Measured compute-rate constants (this repo's bench harnesses; see
# DESIGN.md "Backend crossover model" for the runs behind them).  They are
# deliberately conservative for the device and generous for the host so the
# policy only flips to the device with a clear margin.
RATES = {
    # native seed-indexed scan (pigeonhole chunks + exact probes), mm<=3,
    # >=32 patterns: 47-78 Mbases/s measured at 2k-21k x 890 x 256-2000
    "host_seed_bases_per_s": 5e7,
    # native early-exit mask walk (small pattern sets or mm>3): collapses
    # with pattern count; measured 0.2-2.8 Mbases/s over 256-2000 patterns.
    # Modelled per (base x pattern): 4e8 base*patterns/s.
    "host_mask_basepatterns_per_s": 4e8,
    # pure-NumPy fallback scan (no native toolchain)
    "numpy_basepatterns_per_s": 4e7,
    # device scan, effective sustained at production shapes INCLUDING the
    # on-device sparse-hit extraction: 53 batches x 5.8e10 MACs in 15.6 s
    # measured (21k x 890 x 2000, find_hits_batched, warm) -> ~2e11; the
    # conv/matmul alone peaks far higher (~99 TMAC/s at the kernel bench
    # shape) but the extraction epilogue dominates at scan shapes
    "device_macs_per_s": 3e11,
    # host design Stage A (vectorised window extraction + per-window
    # freq/NN/Viterbi build): ~4e7 window-cells/s profiled on the golden
    # 500x1785x18 cluster (0.3-0.5 s of a 1.7 s full design)
    "host_stagea_cells_per_s": 4e7,
    # device Stage A on-chip compute (the einsums are tiny vs the MXU)
    "device_stagea_cells_per_s": 2e9,
}

# Pessimistic default when probing is disabled/unavailable: the tunneled
# link measured in round 2/3 (DESIGN.md "Backend crossover model") — the
# device is never auto-picked under these numbers unless the host estimate
# is minutes.  dispatch_ms is the full dispatch->fetch round trip of a
# computed result (block_until_ready can return early on relayed links, so
# plain RTT understates it).
TUNNEL_LINK = {"up_mbps": 40.0, "down_mbps": 15.0, "rtt_ms": 23.0,
               "dispatch_ms": 300.0,
               "platform": "assumed-tunnel", "probed": False}

_CACHE = None


def jax_startup_s():
    """One-time cost of bringing up jax in THIS process (import + backend
    init; ~10-15 s measured on this box with the axon platform, ~2-5 s on
    a local install).  Zero once jax is already imported.  The auto
    policies charge it to the device side so a host path that finishes in
    seconds is never beaten by a device estimate that ignores the import
    it would trigger.  Override with MPTPU_JAX_STARTUP_S."""
    import sys
    if "jax" in sys.modules:
        return 0.0
    return float(os.environ.get("MPTPU_JAX_STARTUP_S", "9.0"))


_DEVICE_WARM = False


def mark_device_warm():
    """Called by the device paths after their first successful dispatch in
    this process: later estimates stop charging the first-use constant."""
    global _DEVICE_WARM
    _DEVICE_WARM = True


def device_startup_s():
    """Expected one-time cost of the FIRST device execution in this
    process: the jax import (if still pending) plus the first
    compile+dispatch through the backend.  On this box's relayed chip the
    first jit+fetch measured 0.4 s warm but 207 s when the remote compile
    service was cold — the tail that turned a 13 s host-won scan stage
    into 10 minutes before the policies charged for it.  The default
    charges a conservative middle ground (the cold tail is unknowable in
    advance); override with MPTPU_DEVICE_FIRST_USE_S.  Zero once a device
    path has completed in this process (mark_device_warm)."""
    if _DEVICE_WARM:
        return 0.0
    return jax_startup_s() + float(
        os.environ.get("MPTPU_DEVICE_FIRST_USE_S", "10.0"))


def _cache_path(platform):
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(root, "multiprime_tpu", "link_%s.json" % platform)


def _env_override():
    up = os.environ.get("MPTPU_LINK_UP_MBPS")
    down = os.environ.get("MPTPU_LINK_DOWN_MBPS")
    rtt = os.environ.get("MPTPU_LINK_RTT_MS")
    disp = os.environ.get("MPTPU_LINK_DISPATCH_MS")
    if up or down or rtt or disp:
        rtt_ms = float(rtt or 1.0)
        return {"up_mbps": float(up or down), "down_mbps": float(down or up),
                "rtt_ms": rtt_ms, "dispatch_ms": float(disp or rtt_ms),
                "platform": "env-override", "probed": False}
    return None


def _measure(size_mb=8):
    """Time the link with jax (which must already be importable).  One
    size_mb transfer each way for bandwidth, a few tiny ones for RTT.

    Hard time budget (MPTPU_LINK_PROBE_BUDGET_S, default 15 s): a relayed
    link under load can stall a single tiny device_put for MINUTES — the
    first 100k pipeline run burned 10 min inside this probe (cached
    rtt_ms 121701).  A jax op can't be interrupted once issued, but the
    budget is checked between ops: on overrun the probe returns the
    pessimistic tunnel numbers (marked truncated) instead of issuing more,
    so the policy falls back to host and the pipeline moves on."""
    import numpy as np
    import jax

    budget = float(os.environ.get("MPTPU_LINK_PROBE_BUDGET_S", "15"))
    start = time.time()

    def over():
        return time.time() - start > budget

    def bail():
        got = dict(TUNNEL_LINK)
        got["platform"] = platform
        got["probed"] = True
        got["truncated"] = True
        return got

    platform = jax.default_backend()
    tiny = np.zeros(1024, np.uint8)
    jax.block_until_ready(jax.device_put(tiny))          # warm path
    if over():
        return bail()
    # adaptive iteration count: if the first round trip is already slow,
    # one sample is answer enough
    t0 = time.time()
    jax.block_until_ready(jax.device_put(tiny))
    first = time.time() - t0
    reps = 1 if first > 0.5 else 4
    t0 = time.time()
    for _ in range(reps):
        if over():
            return bail()
        jax.block_until_ready(jax.device_put(tiny))
    rtt_up = (time.time() - t0) / reps
    small_dev = jax.device_put(tiny)
    jax.block_until_ready(small_dev)
    t0 = time.time()
    for _ in range(reps):
        if over():
            return bail()
        np.asarray(small_dev)
    rtt_down = (time.time() - t0) / reps
    if over():
        return bail()
    big = np.zeros(size_mb << 20, np.uint8)
    jax.block_until_ready(jax.device_put(big))           # page-in, warm
    if over():
        return bail()
    t0 = time.time()
    big_dev = jax.device_put(big)
    jax.block_until_ready(big_dev)
    up_s = time.time() - t0
    t0 = time.time()
    np.asarray(big_dev)
    down_s = time.time() - t0
    if over():
        return bail()
    # Full dispatch->fetch round trip of a fresh computed result: on
    # relayed links block_until_ready can return before execution, so the
    # honest dispatch cost only shows at the fetch of a NEW array.  This is
    # the per-dispatch constant the scan estimates need.
    import jax.numpy as jnp
    tinyfn = jax.jit(lambda x, s: x[:8] + s)
    np.asarray(tinyfn(jnp.zeros(1024, jnp.int32), 0))    # compile
    t0 = time.time()
    for i in range(3):
        np.asarray(tinyfn(jnp.zeros(1024, jnp.int32), i + 1))
    dispatch_s = (time.time() - t0) / 3
    return {"up_mbps": round(size_mb / max(up_s, 1e-6), 1),
            "down_mbps": round(size_mb / max(down_s, 1e-6), 1),
            "rtt_ms": round(max(rtt_up, rtt_down) * 1e3, 2),
            "dispatch_ms": round(dispatch_s * 1e3, 2),
            "platform": platform, "probed": True}


def _measure_killable():
    """Run _measure in a subprocess with a hard kill timeout.

    The in-process budget checks can only bail BETWEEN jax ops; a single
    op can stall for minutes on a relayed link (first compile measured
    207 s cold).  A child process can be killed mid-op, so the parent
    never blocks past the timeout.  One-time per machine (disk-cached by
    the caller).  Returns the measured dict, a truncated tunnel-default
    dict, or None when the child failed entirely."""
    import subprocess
    import sys
    budget = float(os.environ.get("MPTPU_LINK_PROBE_BUDGET_S", "15"))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import json\nfrom multiprime_tpu.utils import link\n"
            "print('LINKJSON ' + json.dumps(link._measure()), flush=True)\n")
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=budget + 30, env=env)     # +30: child pays jax import
        for line in out.stdout.splitlines():
            if line.startswith("LINKJSON "):
                return json.loads(line[len("LINKJSON "):])
        return None
    except subprocess.TimeoutExpired:
        got = dict(TUNNEL_LINK)
        got["probed"] = True
        got["truncated"] = True
        return got
    except Exception:
        return None


def probe(force=False):
    """The link numbers for this machine's default device, measured at most
    once per machine (disk cache), zero times when overridden or disabled."""
    global _CACHE
    env = _env_override()          # env wins over the in-process cache so
    if env is not None:            # tests/operators can flip links live
        return env
    if _CACHE is not None and not force:
        return _CACHE
    if os.environ.get("MPTPU_LINK_PROBE", "1") == "0":
        _CACHE = dict(TUNNEL_LINK)
        return _CACHE
    try:
        import jax
        platform = jax.default_backend()
    except Exception:
        _CACHE = dict(TUNNEL_LINK)
        return _CACHE
    path = _cache_path(platform)
    if not force:
        try:
            with open(path) as f:
                got = json.load(f)
            if got.get("platform") == platform:
                _CACHE = got
                return got
        except (OSError, ValueError):
            pass
    if platform == "cpu":
        # no relay to stall on; in-process keeps the probe hermetic for
        # the CPU test environment (monkeypatched _measure included)
        try:
            got = _measure()
        except Exception:
            got = dict(TUNNEL_LINK)
    else:
        got = _measure_killable()
        if got is None:
            got = dict(TUNNEL_LINK)
    if got.get("truncated"):
        # a stalled probe is often transient (relay under load): use the
        # pessimistic numbers for THIS process but let the next one retry
        _CACHE = got
        return got
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.%d" % os.getpid()
        with open(tmp, "w") as f:
            json.dump(got, f)
        os.replace(tmp, path)
    except OSError:
        pass
    _CACHE = got
    return got


def forced_backend():
    """MPTPU_FORCE_BACKEND normalised to 'host'/'device'/None."""
    val = os.environ.get("MPTPU_FORCE_BACKEND", "").strip().lower()
    if val in ("host", "native", "numpy", "cpu"):
        return "host"
    if val in ("device", "tpu", "conv", "jax"):
        return "device"
    return None


# -- time estimates ----------------------------------------------------------

def est_host_scan_s(total_bases, n_patterns, mm, native_ok):
    """Host wall-clock estimate for a mismatch scan."""
    if native_ok and 0 <= mm <= 3 and n_patterns >= 32:
        return total_bases / RATES["host_seed_bases_per_s"]
    if native_ok:
        return total_bases * n_patterns / RATES["host_mask_basepatterns_per_s"]
    return total_bases * n_patterns / RATES["numpy_basepatterns_per_s"]


def est_device_scan_s(total_bases, n_patterns, plen, n_batches,
                      upload_bytes, link=None, resident=False,
                      max_hits=1 << 17, want_mism=False):
    """Device wall-clock estimate for the fused batched scan
    (ops.mismatch_scan.find_hits_batched): one corpus upload, ONE
    dispatch->fetch round trip, one [n_batches, max_hits] packed-hit
    fetch, plus the on-chip MACs.

    ``resident=True`` drops the upload term (corpus already pinned in HBM
    via the scan's corpus_cache)."""
    link = link or probe()
    t = 0.0
    if not resident:
        t += upload_bytes / (link["up_mbps"] * 1e6)
    t += link.get("dispatch_ms", link["rtt_ms"]) / 1e3
    fetch_bytes = n_batches * (1 + max_hits * (2 if want_mism else 1)) * 4
    t += fetch_bytes / (link["down_mbps"] * 1e6)
    macs = 2.0 * total_bases * n_patterns * plen * 4
    t += macs / RATES["device_macs_per_s"]
    return t


def est_host_stagea_s(n_seqs, n_windows, plen):
    """Host Stage-A estimate for the design engine (window extraction +
    per-window freq/NN/Viterbi build)."""
    return n_seqs * n_windows * plen / RATES["host_stagea_cells_per_s"]


def est_device_stagea_s(n_seqs, n_windows, plen, block=512, link=None):
    """Device Stage-A estimate.  The dominant term is shipping the patched
    window tensor back to the host Stage B: n_seqs*n_windows*plen int8
    bytes, plus one round trip per window block, plus tiny on-chip work."""
    link = link or probe()
    cells = n_seqs * n_windows * plen
    blocks = max(1, -(-n_windows // block))
    dispatch_s = link.get("dispatch_ms", link["rtt_ms"]) / 1e3
    return (cells / (link["down_mbps"] * 1e6)
            + blocks * dispatch_s
            + cells / RATES["device_stagea_cells_per_s"])
