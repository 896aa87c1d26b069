"""Genome-scale specificity demo (capability the reference cannot express).

The reference's bowtie-backed specificity path warns against targets over
100 kb (/root/reference/README.md:35); its own background scans stay at
gene scale.  This demo runs `multiprime_tpu.validate.specificity` against
a synthetic bacterial-pan-genome-scale background — N genomes x ~4.6 Mb
(E. coli scale) — with planted F/R off-target sites, at mm=2 (bowtie2
seed territory) and mm=4 (beyond bowtie2 -N<=1 entirely), and prints
throughput + peak RSS.  The segmented `seg_len` scan (DESIGN.md) keeps
per-genome memory bounded; positions are absolute with exactly-once
boundary dedup.

Usage:  python examples/genome_specificity.py [n_genomes] [out_dir]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_corpus(out_dir, n_genomes=10, genome_len=4_600_000, n_pairs=50,
                 seed=0):
    rng = np.random.default_rng(seed)
    lut = np.array(list("ACGT"))
    lut8 = np.frombuffer(b"ACGT", np.uint8)
    primers = [("".join(rng.choice(lut, size=18)),
                "".join(rng.choice(lut, size=18)))
               for _ in range(n_pairs)]
    primer_fa = os.path.join(out_dir, "primers.fa")
    with open(primer_fa, "w") as f:
        for k, (pf, pr) in enumerate(primers):
            f.write(">P%d_F\n%s\n>P%d_R\n%s\n" % (k, pf, k, pr))
    bg_fa = os.path.join(out_dir, "background.fa")
    from multiprime_tpu.utils import iupac
    n_planted = 0
    with open(bg_fa, "w") as f:
        for g in range(n_genomes):
            genome = lut8[rng.integers(0, 4, genome_len)]
            # plant 3 off-target amplicons per genome: F site + RC(R) site
            # within an amplifiable window (specificity joins F x R)
            for _ in range(3):
                pf, pr = primers[int(rng.integers(n_pairs))]
                start = int(rng.integers(1000, genome_len - 2000))
                prod = int(rng.integers(150, 1200))
                fb = np.frombuffer(pf.encode(), np.uint8)
                rb = np.frombuffer(iupac.rc(pr).encode(), np.uint8)
                genome[start:start + 18] = fb
                genome[start + prod - 18:start + prod] = rb
                n_planted += 1
            f.write(">genome_%d\n" % g)
            s = genome.tobytes().decode()
            for i in range(0, len(s), 80):
                f.write(s[i:i + 80] + "\n")
    return primer_fa, bg_fa, n_planted


def main():
    n_genomes = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/genome_spec"
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    primer_fa, bg_fa, n_planted = build_corpus(out_dir, n_genomes)
    mb = os.path.getsize(bg_fa) / 1e6
    print("corpus: %d genomes, %.0f MB fasta, %d planted off-target "
          "amplicons (%.1f s)" % (n_genomes, mb, n_planted,
                                  time.time() - t0), flush=True)
    from multiprime_tpu.validate import specificity
    for mm in (2, 4):
        t0 = time.time()
        rows = specificity.run(
            primer_fa, bg_fa, os.path.join(out_dir, "offtarget.mm%d.out"
                                           % mm),
            term_len=18, mm=mm, term=4, product_size=(100, 1500),
            exhaustive_join=True)
        dt = time.time() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print("mm=%d: %.1f s (%.1f Mb*primer/s), %d predicted off-target "
              "amplicons, peak RSS %d MB"
              % (mm, dt, mb * 100 / dt, len(rows), rss), flush=True)
        if mm == 2:
            assert len(rows) >= n_planted, \
                "planted off-targets not all recovered"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
