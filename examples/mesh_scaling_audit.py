"""Virtual-mesh scaling audit (VERDICT r2 next-round #5).

Runs the two sharded production kernels — Stage-A design stats and the
sparse coverage scan — on a FIXED workload over N in {1, 2, 4, 8} virtual
CPU devices, reporting wall-clock and the per-shard communication volume
implied by the sharding layout.  Real multi-chip runs are impossible in
this environment (one tunneled chip), so this is the strong-scaling trend
plus an analytic communication model; DESIGN.md ("Sharding") carries the
resulting table and the projected 2-host efficiency.

Each mesh size runs in a fresh subprocess (XLA fixes the virtual device
count at backend init).  Usage:  python examples/mesh_scaling_audit.py
"""

import json
import os
import subprocess
import sys
import time

# runnable from anywhere: python adds the script dir (examples/), not the
# repo root, to sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(n_devices):
    """Child: build the mesh, run both kernels, print one JSON line."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=%d"
                               % n_devices).strip()
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from multiprime_tpu.ops import mismatch_scan as ms
    from multiprime_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(n_devices)
    seq_sh, win_sh = mesh.shape["seq"], mesh.shape["win"]
    rng = np.random.default_rng(0)
    lut = np.array(list("ACGT"))

    # --- Stage A: 512 seqs x 2048 cols, 1024 windows -------------------------
    n_seqs, length, n_win, plen = 512, 2048, 1024, 18
    masks = (1 << rng.integers(0, 4, size=(n_seqs, length))).astype(np.int32)
    masks[rng.random((n_seqs, length)) < 0.05] = 0
    positions = np.arange(8, 8 + n_win, dtype=np.int32)
    list(pmesh.design_stats_blocks_sharded(mesh, masks, positions,
                                           plen=plen, block=512))  # compile
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = list(pmesh.design_stats_blocks_sharded(
            mesh, masks, positions, plen=plen, block=512))
    stage_a_s = (time.time() - t0) / reps
    # psum payload per window-shard device: freq + nn + cover/gap (int64/32)
    w_shard = n_win // win_sh
    psum_bytes = w_shard * (plen * 4 * 8 + (plen - 1) * 16 * 8 + 2 * 4)
    # ring all-reduce over seq axis moves 2*(s-1)/s of the payload
    stage_a_comm = int(2 * (seq_sh - 1) / seq_sh * psum_bytes) \
        if seq_sh > 1 else 0

    # --- sparse scan: 4096 x 1024nt x 256 patterns ---------------------------
    n_t, tlen, n_p = 4096, 1024, 256
    targets = ["".join(rng.choice(lut, size=tlen)) for _ in range(512)]
    targets = (targets * (n_t // len(targets)))[:n_t]
    pats = ["".join(rng.choice(lut, size=plen)) for _ in range(n_p)]
    t1h, lens = ms.encode_target_masks(targets, length=tlen)
    p1h = ms.encode_primers(pats)
    s1h = p1h.copy()
    s1h[:, :-4, :] = 0
    pmesh.find_hits_sharded(mesh, t1h, lens, p1h, s1h, mm=1, term=4,
                            max_hits_per_shard=1 << 15)            # compile
    t0 = time.time()
    for _ in range(reps):
        blocks = pmesh.find_hits_sharded(mesh, t1h, lens, p1h, s1h,
                                         mm=1, term=4,
                                         max_hits_per_shard=1 << 15)
    scan_s = (time.time() - t0) / reps
    # scan communication: none between shards (pure DP); per-shard output
    # gather = the packed block, broadcast input = the primer tensors
    scan_out_bytes = int(blocks.nbytes // n_devices)
    bcast_bytes = int(p1h.nbytes + s1h.nbytes)

    print(json.dumps({
        "n": n_devices, "mesh": [seq_sh, win_sh],
        "stage_a_s": round(stage_a_s, 3),
        "stage_a_psum_bytes_per_dev": stage_a_comm,
        "scan_s": round(scan_s, 3),
        "scan_gather_bytes_per_dev": scan_out_bytes,
        "scan_bcast_bytes": bcast_bytes,
    }))


def main():
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(n)],
            capture_output=True, text=True, env=env, check=True)
        line = out.stdout.strip().splitlines()[-1]
        rows.append(json.loads(line))
        print(line, flush=True)
    base_a = rows[0]["stage_a_s"]
    base_s = rows[0]["scan_s"]
    print("\n| N | mesh (seq x win) | Stage A s | speedup | eff | "
          "psum B/dev | scan s | speedup | eff |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        n = r["n"]
        print("| %d | %dx%d | %.3f | %.2fx | %d%% | %s | %.3f | %.2fx "
              "| %d%% |" % (
                  n, r["mesh"][0], r["mesh"][1], r["stage_a_s"],
                  base_a / r["stage_a_s"],
                  round(100 * base_a / r["stage_a_s"] / n),
                  "{:,}".format(r["stage_a_psum_bytes_per_dev"]),
                  r["scan_s"], base_s / r["scan_s"],
                  round(100 * base_s / r["scan_s"] / n)))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        run_one(int(sys.argv[2]))
    else:
        main()
