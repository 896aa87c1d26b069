"""Path-normalised sha256 manifest of a results tree.

Several reference formats embed the absolute tree root in payloads
(candidate txt column 1, sort files, solve xls rows, PCR keys); those
occurrences are rewritten to @ROOT@ before hashing so manifests from two
different result dirs are comparable.  pipeline_metrics.json (timings)
is skipped.
"""
import hashlib
import os
import sys

root = os.path.abspath(sys.argv[1])
out = sys.argv[2]
rb = root.encode()
entries = []
for dirpath, _, files in os.walk(root):
    for name in files:
        p = os.path.join(dirpath, name)
        rel = os.path.relpath(p, root)
        if rel.endswith("pipeline_metrics.json"):
            continue
        h = hashlib.sha256()
        n = os.path.getsize(p)
        with open(p, "rb") as f:
            # chunked + carry; never cut through a root occurrence
            carry = b""
            while True:
                chunk = f.read(1 << 24)
                buf = carry + chunk
                if not chunk:
                    h.update(buf.replace(rb, b"@ROOT@"))
                    break
                cut = max(0, len(buf) - (len(rb) - 1))
                while True:
                    q = buf.find(rb, max(0, cut - len(rb) + 1),
                                 cut - 1 + len(rb))
                    if q == -1:
                        break
                    cut = q + len(rb)
                h.update(buf[:cut].replace(rb, b"@ROOT@"))
                carry = buf[cut:]
        entries.append((rel, h.hexdigest(), n))
entries.sort()
with open(out, "w") as f:
    for rel, dig, n in entries:
        f.write("%s\t%s\t%d\n" % (dig, rel, n))
print("hashed %d files" % len(entries), flush=True)
