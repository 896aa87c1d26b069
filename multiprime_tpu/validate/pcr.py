"""Perfect-match in-silico PCR (extract_PCR_product equivalent).

Re-implements /root/reference/scripts/extract_PCR_product.py (class
Product:120-263): for each primer pair, find the first matching F expansion in
each one-line target sequence, then the first R expansion whose reverse
complement occurs downstream; emit per-pair product / non-product FASTAs and
the Coverage_stast.xls summary.

The scan itself is substring search over expansions, exactly like the
reference; the batched mismatch-tolerant version (which subsumes this as
mm=0) lives in multiprime_tpu.ops.mismatch_scan / validate.scan.
"""

from __future__ import annotations

import os
from pathlib import Path

from ..utils import iupac

RC_ACGT = str.maketrans("ATGC", "TACG")


def _rc(seq):
    return seq.translate(RC_ACGT)[::-1]


def parse_pairs_xls(path):
    """final_maxprimers_set.xls -> {key: (F, R)} (extract_PCR_product.py:144-156)."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fields = line.strip().split("\t")
            cluster_id = fields[0].split("/")[-1].split(".")[0]
            start = fields[6].split(":")[0]
            stop = fields[6].split(":")[1]
            key = "%s_%s_F_%s_%s" % (cluster_id, start, cluster_id, stop)
            out[key] = (fields[2], fields[3])
    return out


def parse_pairs_fa(path):
    """4-line groups: >Fid, F, >Rid, R (extract_PCR_product.py:157-168)."""
    out = {}
    lines = [l.strip() for l in open(path) if l.strip()]
    for i in range(0, len(lines) - 3, 4):
        key = lines[i].lstrip(">") + "_" + lines[i + 2].lstrip(">")
        out[key] = (lines[i + 1], lines[i + 3])
    return out


def pcr_products(primer_f, primer_r, ref_file):
    """-> (products {id: seq}, non_products {id: seq})."""
    f_exp = iupac.expand(primer_f)
    r_exp = iupac.expand(primer_r)
    products, non_products = {}, {}
    with open(ref_file) as r:
        key = None
        for line in r:
            if line.startswith(">"):
                key = line.strip()
                continue
            value = ""
            for fseq in f_exp:
                if fseq in line:
                    tail = line.split(fseq)[1]
                    product = fseq + tail
                    for rseq in r_exp:
                        rc = _rc(rseq)
                        if rc in product:
                            value = product.split(rc)[0].strip() + rc
                            break
                    if value:
                        break
            if value:
                products[key] = value
            else:
                non_products[key] = line.strip()
    return products, non_products


def run(pairs, ref_file, out_dir, coverage_file):
    """Drive all pairs; write per-pair FASTAs + the coverage summary
    (extract_PCR_product.py:218-263)."""
    os.makedirs(out_dir, exist_ok=True)
    covered, uncovered = set(), set()
    with open(coverage_file, "a+") as cov:
        for key, (primer_f, primer_r) in pairs.items():
            products, non_products = pcr_products(primer_f, primer_r, ref_file)
            cov.write("Number of Product/non_Product, primer-F and primer-R: "
                      "{}\t{}\t{}\t{}\t{}\n".format(
                          key, len(products), len(non_products),
                          primer_f, primer_r))
            # Path.with_suffix like the reference (extract_PCR_product.py:
            # 232-234): a dotted key has its final ".suffix" REPLACED.
            base = str(Path(out_dir).joinpath(key).with_suffix(""))
            with open(base + ".PCR.product.fa", "w") as p:
                for rid, seq in products.items():
                    covered.add(rid)
                    p.write(rid + "\n" + seq + "\n")
            with open(base + ".non_PCR.product.fa", "w") as np_:
                for rid, seq in non_products.items():
                    uncovered.add(rid)
                    np_.write(rid + "\n" + seq + "\n")
    n_seqs = 0
    with open(ref_file, encoding="utf-8") as f:
        for chunk in iter(lambda: f.read(1 << 20), ""):
            n_seqs += chunk.count("\n")
    n_seqs = int(n_seqs / 2)
    with open(coverage_file, "a+") as cov:
        cov.write("Total number of sequences:\t{}\n"
                  "Coveraged number of sequence:\t{}\n"
                  "Rate of coverage:\t>= {}\n".format(
                      n_seqs, len(covered),
                      round(float(len(covered)) / n_seqs, 2)))
    return covered, uncovered
