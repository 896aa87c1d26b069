"""Sample instantaneous RSS of a process tree every N seconds.

Logs: ts  total_MB  per-pid breakdown.  The honest peak-memory metric is
the MAX over samples of the SUM over the live tree at that instant
(scale21k.py's SELF_max+CHILDREN_max adds non-concurrent peaks).
"""
import os
import sys
import time

root_pid = int(sys.argv[1])
out = sys.argv[2]
interval = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0


def descendants(pid):
    pids = [pid]
    i = 0
    while i < len(pids):
        p = pids[i]
        i += 1
        try:
            for t in os.listdir("/proc/%d/task" % p):
                try:
                    kids = open("/proc/%d/task/%s/children" % (p, t)).read()
                    pids += [int(k) for k in kids.split()]
                except OSError:
                    pass
        except OSError:
            pass
    return pids


def rss_mb(pid):
    try:
        for line in open("/proc/%d/status" % pid):
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    except OSError:
        return 0
    return 0


peak = 0
with open(out, "w") as f:
    while True:
        try:
            os.kill(root_pid, 0)
        except OSError:
            break
        tree = descendants(root_pid)
        parts = [(p, rss_mb(p)) for p in tree]
        total = sum(m for _, m in parts)
        peak = max(peak, total)
        f.write("%.0f %d %s\n" % (time.time(), total,
                                  " ".join("%d:%d" % x for x in parts if x[1] > 50)))
        f.flush()
        time.sleep(interval)
    f.write("PEAK_MB %d\n" % peak)
