"""21k-seq flagship scale run (seeded synthetic; DESIGN.md perf table).

Generates the round-2/3 scale workload — 20 families x 1000 members
(900 bp, per-family member divergence cycling 1%/2%/5%/8% so some
families design cleanly at coverage 0.7 and others stress the gates,
10% exact duplicates) + 1000 random singletons -> ~1020-cluster
fan-out — and drives the FULL pipeline
(format -> dedup -> cluster -> ANI -> MSA -> design -> pair -> solve ->
PCR -> scan), printing per-stage timings and peak RSS.

Usage:  python examples/scale21k.py [results_dir] [pcr_products]
        pcr_products in {full, gzip, summary} (default summary — the
        reference-contract `full` writes ~12.5 GB of per-pair FASTAs)
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate(fa_path, seed=0,
             n_fams=int(os.environ.get("MPTPU_SCALE_FAMS", "20")),
             members=int(os.environ.get("MPTPU_SCALE_MEMBERS", "1000")),
             singletons=int(os.environ.get("MPTPU_SCALE_SINGLETONS",
                                           "1000"))):
    rng = np.random.default_rng(seed)
    lut = np.array(list("ACGT"))
    with open(fa_path, "w") as f:
        divergences = (0.01, 0.02, 0.05, 0.08)
        for fam in range(n_fams):
            div = divergences[fam % len(divergences)]
            base = np.frombuffer(
                "".join(rng.choice(lut, size=900)).encode(), np.uint8).copy()
            for m in range(members):
                if m % 10 == 0:
                    arr = base
                else:
                    arr = base.copy()
                    mut = rng.random(len(arr)) < div
                    arr[mut] = np.frombuffer("".join(
                        rng.choice(lut, size=int(mut.sum()))).encode(),
                        np.uint8)
                f.write(">F%d_%d\n%s\n" % (fam, m, arr.tobytes().decode()))
        for s in range(singletons):
            f.write(">S%d\n%s\n"
                    % (s, "".join(rng.choice(lut, size=900))))


def compare_trees(a, b):
    """Byte-compare two results trees.  Several reference formats embed
    the absolute output path in the payload (candidate txt column 1,
    sort files, empty-candidate markers), so occurrences of tree a's
    root are rewritten to tree b's before comparing; everything else must
    match byte-for-byte.  pipeline_metrics.json (timings) is skipped."""
    ra = os.path.abspath(a).encode()
    rb = os.path.abspath(b).encode()
    n = 0
    for root, _, files in os.walk(a):
        for name in files:
            pa = os.path.join(root, name)
            rel = os.path.relpath(pa, a)
            if rel.endswith("pipeline_metrics.json"):
                continue
            with open(pa, "rb") as f1, open(os.path.join(b, rel),
                                            "rb") as f2:
                assert f1.read().replace(ra, rb) == f2.read(), \
                    "tree differs: " + rel
            n += 1
    return n


def main():
    res_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale21k_res"
    products = sys.argv[2] if len(sys.argv) > 2 else "summary"
    devices = int(os.environ.get("MPTPU_SCALE_DEVICES", "1"))
    shards = int(os.environ.get("MPTPU_SCALE_SHARDS", "0"))
    compare_to = os.environ.get("MPTPU_SCALE_COMPARE", "")
    fa = os.path.join(os.path.dirname(res_dir) or ".", "scale21k.fa")
    if not os.path.exists(fa):
        t0 = time.time()
        generate(fa)
        print("generated %s in %.1f s" % (fa, time.time() - t0), flush=True)
    from multiprime_tpu.pipeline.driver import run_pipeline
    t0 = time.time()
    kw = dict(input_fa=fa, results_dir=res_dir, virus_name="scale21k",
              nproc=os.cpu_count() or 2, pcr_products=products,
              devices=devices)
    if shards > 1:
        # multi-host demo on one box: P shard worker processes over the
        # shared results dir (each `mptpu run --cluster-shard i/P`), then
        # one aggregating resume run.  Worker wall-clock = the fan-out
        # cost of its shard; the resume run adds the solve/validate tail.
        import subprocess
        t_shard = time.time()
        procs = []
        for i in range(shards):
            args = [sys.executable, "-m", "multiprime_tpu.cli.main", "run",
                    "-i", fa, "-r", res_dir,
                    "--cluster-shard", "%d/%d" % (i, shards),
                    "--pcr-products", products]
            env = dict(os.environ)
            env["PYTHONPATH"] = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))
            procs.append(subprocess.Popen(args, env=env))
        for p in procs:
            assert p.wait() == 0
        print("shard fan-out (%d workers): %.1f s"
              % (shards, time.time() - t_shard), flush=True)
    pipe, log = run_pipeline(None, **kw)
    total = time.time() - t0
    for name, status, dt in log:
        if status == "ran" and dt:
            print("%-20s %ss" % (name, dt))
    print("TOTAL %.1f s (%.1f min), pcr_products=%s, devices=%d, "
          "shards=%d, peak RSS %d MB"
          % (total, total / 60, products, devices, shards,
             resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
             + sum(resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss
                   for _ in [0]) // 1024), flush=True)
    if compare_to:
        n = compare_trees(compare_to, res_dir)
        print("COMPARE OK: %d files byte-identical vs %s"
              % (n, compare_to), flush=True)


if __name__ == "__main__":
    main()
