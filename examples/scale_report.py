"""Summarise a completed scale run: per-stage timings, tree size, peak RSS.

Reads <results_dir>/pipeline_metrics.json (written by the driver at run
end) and an optional rss_sampler.py log, prints one JSON object ready to
be quoted in DESIGN.md/BASELINE.md.

Usage: python examples/scale_report.py <results_dir> [rss.log]
"""

import json
import os
import sys


def tree_stats(res):
    n_files = 0
    n_bytes = 0
    for root, _, files in os.walk(res):
        for f in files:
            n_files += 1
            try:
                n_bytes += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return n_files, n_bytes


def main():
    res = sys.argv[1]
    metrics = json.load(open(os.path.join(res, "pipeline_metrics.json")))
    out = {"stages_s": metrics.get("timings_s", {}),
           "total_s": round(sum(metrics.get("timings_s", {}).values()), 1)}
    cl = os.path.join(res, "cluster.txt")
    if os.path.exists(cl):
        out["clusters"] = sum(1 for _ in open(cl)) - 1
    xls = os.path.join(res, "Primers_set", "final_maxprimers_set.xls")
    if os.path.exists(xls):
        out["final_set_pairs"] = sum(1 for _ in open(xls)) - 1
    cov = os.path.join(res, "Primers_set", "Coverage_stast.xls")
    if os.path.exists(cov):
        out["coverage_stast_tail"] = open(cov).read().strip().splitlines()[-1]
    n_files, n_bytes = tree_stats(res)
    out["tree_files"] = n_files
    out["tree_gb"] = round(n_bytes / 1e9, 2)
    if len(sys.argv) > 2 and os.path.exists(sys.argv[2]):
        peak = 0
        for line in open(sys.argv[2]):
            parts = line.split()
            if parts[0] == "PEAK_MB":
                peak = max(peak, int(parts[1]))
            elif len(parts) >= 2 and parts[1].isdigit():
                peak = max(peak, int(parts[1]))
        out["peak_rss_mb_tree_concurrent"] = peak
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
