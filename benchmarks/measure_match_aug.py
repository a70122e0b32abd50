"""Experiment: how much SPSS weight does matching augmentation recover?

The greedy handshake matching (core/graph.py) is maximal but not maximum;
every extra matched edge removes one output string, saving k-1 output
bases (reference weight accounting: lib/core/spss.h:936-1011).  This
measures the gap closable by length-3 alternating-path augmentation:

    free u --e1-- v ==matched== w --e2-- x free   (u != x)
    =>  unmatch (v,w); match (u,v), (w,x)         net +1 edge

Run: JAX_PLATFORMS=cpu python benchmarks/measure_match_aug.py FILE.fasta [k]
"""

import sys
import time

import numpy as np

from kmerset_tpu.core import spss
from kmerset_tpu.core.graph import handshake_matching
from kmerset_tpu.core.kmer_counter import KmerCounter


def augment_rounds(pa, pb, match, max_rounds=32):
    """Sequential-priority length-3 augmentation until fixpoint.
    Reference-free experiment code: O(E) python/numpy per round."""
    n_ports = match.shape[0]
    total_aug = 0
    for rnd in range(max_rounds):
        free = match < 0
        # Orient each edge both ways: (src, dst) with src free, dst matched.
        src = np.concatenate([pa, pb])
        dst = np.concatenate([pb, pa])
        keep = free[src] & ~free[dst]
        src, dst = src[keep], dst[keep]
        if src.size == 0:
            break
        # For each matched edge (v, w) = (dst, match[dst]) we need a free
        # neighbor on each endpoint.  Work per matched-edge id: canonical
        # id = min(v, w).
        eid = np.minimum(dst, match[dst])
        other = match[dst]  # the far endpoint of the matched edge
        # Group candidates by (eid, which-endpoint).
        # For endpoint v of edge eid: free neighbors u with (u, v).
        # Select the min-priority candidate per (eid, endpoint).
        prio = np.arange(src.size, dtype=np.int64)
        # key: eid * 2 + (dst == eid ? 0 : 1)
        side = (dst != eid).astype(np.int64)
        key = eid * 2 + side
        order = np.lexsort((prio, key))
        key_s = key[order]
        first = np.ones(key_s.size, dtype=bool)
        first[1:] = key_s[1:] != key_s[:-1]
        sel = order[first]
        # sel rows: best free neighbor per (edge, endpoint).  An edge is
        # augmentable when both endpoints have one and the two free ports
        # differ.
        k_sel = key[sel]
        e_sel = k_sel >> 1
        s_sel = k_sel & 1
        # Build per-edge endpoint slots.
        cand = {}
        aug = []
        used = np.zeros(n_ports, dtype=bool)
        # pair up rows with same e_sel
        order2 = np.argsort(e_sel, kind="stable")
        es = e_sel[order2]
        i = 0
        rows = sel[order2]
        while i < len(es) - 1:
            if es[i] == es[i + 1]:
                r0, r1 = rows[i], rows[i + 1]
                u0, v0 = src[r0], dst[r0]
                u1, v1 = src[r1], dst[r1]
                i += 2
                if u0 == u1:
                    continue
                if used[u0] or used[u1] or used[v0] or used[v1]:
                    continue
                aug.append((u0, v0, u1, v1))
                used[u0] = used[u1] = used[v0] = used[v1] = True
            else:
                i += 1
        if not aug:
            break
        for u0, v0, u1, v1 in aug:
            match[u0] = v0
            match[v0] = u0
            match[u1] = v1
            match[v1] = u1
        total_aug += len(aug)
        print(f"  round {rnd}: +{len(aug)} edges")
    return total_aug


def main():
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    t0 = time.time()
    counter = KmerCounter.from_fasta(k, path, "", canonical=True)
    kset, _ = counter.to_kmer_set(1)
    print(f"load+count: {time.time()-t0:.1f}s  kmers={kset.size()}")
    t0 = time.time()
    unitigs = spss.get_unitigs_canonical(kset)
    n = len(unitigs)
    print(f"unitigs: {time.time()-t0:.1f}s  n={n}")
    t0 = time.time()
    pa, pb = spss._candidate_port_edges_canonical(unitigs, k)
    print(f"edges: {time.time()-t0:.1f}s  m={pa.size}")
    t0 = time.time()
    match = handshake_matching(pa, pb, 2 * n)
    m0 = int((match >= 0).sum()) // 2
    free0 = int((match < 0).sum())
    print(f"greedy: {time.time()-t0:.1f}s  matched={m0} freeports={free0}")
    t0 = time.time()
    extra = augment_rounds(pa, pb, match.copy())
    print(f"augment: {time.time()-t0:.1f}s  extra={extra} "
          f"({100.0*extra/max(m0,1):.2f}% more edges)")
    nk = kset.size()
    w0 = nk + (k - 1) * (n - m0)
    w1 = nk + (k - 1) * (n - m0 - extra)
    print(f"weight bound: {w0} -> {w1}  (-{100.0*(w0-w1)/w0:.3f}%) "
          f"[cycle-break losses not charged]")


if __name__ == "__main__":
    main()
