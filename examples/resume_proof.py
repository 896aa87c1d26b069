"""Byte-identical resume proof at scale (VERDICT r4 item #1).

Given a COMPLETED results tree (e.g. the 1M-sequence envelope run from
examples/scale21k.py with MPTPU_SCALE_FAMS=960 MPTPU_SCALE_MEMBERS=1000
MPTPU_SCALE_SINGLETONS=40000), this script

  1. snapshots the solve/validate tail (Primers_set/, Core_primers_set/)
     plus a sample of per-cluster design/pair outputs,
  2. deletes those files from the tree (simulating a crash that lost the
     tail and part of the fan-out),
  3. re-enters the resumable driver (same skip-if-exists contract the
     reference delegates to Snakemake, SURVEY.md s5.3), and
  4. byte-compares every restored file against the snapshot.

The paths embedded in several reference formats are identical across the
two runs (same tree root), so the comparison is a strict byte compare.

Usage: python examples/resume_proof.py <results_dir> <input_fa> [n_sample]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    res = os.path.abspath(sys.argv[1])
    fa = os.path.abspath(sys.argv[2])
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    snap = res + ".resume_snapshot"
    if os.path.exists(snap):
        shutil.rmtree(snap)
    os.makedirs(snap)

    # victims: whole solve/validate tail + a spread of per-cluster outputs
    victims = []
    for d in ("Primers_set", "Core_primers_set"):
        full = os.path.join(res, d)
        if os.path.isdir(full):
            for root, _, files in os.walk(full):
                victims += [os.path.join(root, f) for f in files]
    names = [line.split("\t")[0] for line in
             open(os.path.join(res, "cluster.txt")).read().splitlines()[1:]]
    stride = max(1, len(names) // n_sample)
    sampled = names[::stride][:n_sample]
    for name in sampled:
        for sub, suffixes in (
                ("Clusters_primer", (".top.primer.out",
                                     ".top.primer.out.gap_seq_id_json",
                                     ".top.primer.out.non_coverage_seq_id_json")),
                ("Clusters_cprimer", (".candidate.primers.txt",))):
            for suf in suffixes:
                p = os.path.join(res, sub, name + suf)
                if os.path.exists(p):
                    victims.append(p)
    print("snapshotting %d files (%d sampled clusters + tail)"
          % (len(victims), len(sampled)), flush=True)
    for p in victims:
        rel = os.path.relpath(p, res)
        dst = os.path.join(snap, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(p, dst)
        os.remove(p)

    from multiprime_tpu.pipeline.driver import run_pipeline
    t0 = time.time()
    run_pipeline(None, input_fa=fa, results_dir=res,
                 virus_name=os.path.basename(fa).split(".")[0],
                 nproc=os.cpu_count() or 2, pcr_products="summary")
    dt = time.time() - t0
    print("resume completed in %.1f s" % dt, flush=True)

    n_ok = 0
    for root, _, files in os.walk(snap):
        for f in files:
            sp = os.path.join(root, f)
            rel = os.path.relpath(sp, snap)
            rp = os.path.join(res, rel)
            with open(sp, "rb") as f1, open(rp, "rb") as f2:
                assert f1.read() == f2.read(), "resume differs: " + rel
            n_ok += 1
    print("RESUME OK: %d files byte-identical after resume (%.1f s)"
          % (n_ok, dt), flush=True)


if __name__ == "__main__":
    main()
