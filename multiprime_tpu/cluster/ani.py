"""k-mer ANI estimation + small-cluster merging (fastANI replacement).

The reference's merge_cluster_by_ANI.py:116-279 shells out to fastANI for
every small cluster against each bigger cluster and merges (or drops) the
small cluster when the mean ANI >= threshold.  Here ANI between two sequences
is estimated from k-mer set Jaccard via the Mash distance identity

    ANI ~= 1 + ln(2j / (1 + j)) / k

which tracks fastANI's fragment-mapping estimate closely at the 80%+ range
the pipeline thresholds on.
"""

from __future__ import annotations

import math

import numpy as np

from .greedy import _encode, kmer_set


def ani_estimate(seq_a, seq_b, k=16):
    """Approximate average nucleotide identity in [0, 1]."""
    ka = kmer_set(_encode(seq_a), k)
    kb = kmer_set(_encode(seq_b), k)
    if ka.size == 0 or kb.size == 0:
        return 0.0
    inter = np.intersect1d(ka, kb, assume_unique=True).size
    union = ka.size + kb.size - inter
    if inter == 0:
        return 0.0
    j = inter / union
    return max(0.0, 1.0 + math.log(2 * j / (1 + j)) / k)


def mean_cluster_ani(small_seqs, big_seqs, k=16, max_pairs=100):
    """Mean pairwise ANI between two clusters (subsampled like the
    reference's per-seq file lists)."""
    total, count = 0.0, 0
    for i, a in enumerate(small_seqs):
        for j, b in enumerate(big_seqs):
            if count >= max_pairs:
                return total / count
            total += ani_estimate(a, b, k)
            count += 1
    return total / count if count else 0.0


def merge_small_clusters(clusters, seqs_by_cluster, min_size=10,
                         ani_threshold=0.8, drop=False, k=16):
    """Merge clusters smaller than min_size into the best big cluster with
    mean ANI >= threshold; optionally drop unmergeable small clusters.

    clusters: list of member-id lists (big + small), ordered by size desc.
    seqs_by_cluster: list of member-sequence lists.
    -> (new_clusters, history): history rows mirror the reference's
    history.txt ("merged small -> big" / "dropped small").
    """
    sizes = [len(c) for c in clusters]
    big_idx = [i for i, s in enumerate(sizes) if s >= min_size]
    small_idx = [i for i, s in enumerate(sizes) if s < min_size]
    merged = {i: list(clusters[i]) for i in big_idx}
    history = []
    kept_small = []
    for si in small_idx:
        best, best_ani = None, 0.0
        for bi in big_idx:
            a = mean_cluster_ani(seqs_by_cluster[si], seqs_by_cluster[bi], k)
            if a > best_ani:
                best, best_ani = bi, a
        if best is not None and best_ani >= ani_threshold:
            merged[best].extend(clusters[si])
            history.append(("merged", si, best, round(best_ani, 4)))
        elif drop:
            history.append(("dropped", si, None, round(best_ani, 4)))
        else:
            kept_small.append(si)
            history.append(("kept", si, None, round(best_ani, 4)))
    out = [merged[i] for i in big_idx] + [clusters[i] for i in kept_small]
    return out, history
