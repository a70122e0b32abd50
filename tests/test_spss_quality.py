"""SPSS matching-quality guards (round-4 verdict item 4).

The compressed-size target (BASELINE.md: within 2% of the reference) is
carried by the greedy path cover's quality.  Two pins so a matching
regression fails CI instead of silently costing weight:

1. fast (parallel handshake) weight stays within 2% of the sequential
   reference-quality mode on randomized canonical sets (the reference's
   A/B pair: lib/core/spss.h:1358-1539 parallel vs :1208-1356
   sequential; measured worst ratio over these seeds: 1.008 — fast is
   usually BETTER).
2. on small graphs the fast cover achieves the brute-force OPTIMAL
   path count (max port-disjoint edge subset minus forced cycle cuts).
   Greedy maximal matching has no such guarantee in general; these
   pinned seeds empirically reach the optimum, so any change that
   stops reaching it is a real quality regression.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from kmerset_tpu.core import spss
from kmerset_tpu.utils.random import get_random_kmer_set

K = 9


@pytest.mark.parametrize("seed", range(12))
def test_fast_weight_within_2pct_of_sequential(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(100, 1 << 12))
    s = get_random_kmer_set(K, n, True, rng)
    unitigs = spss.get_unitigs_canonical(s)
    w_fast = spss.get_spss_canonical_from_unitigs(unitigs, K, fast=True).weight()
    w_seq = spss.get_spss_canonical_from_unitigs(unitigs, K, fast=False).weight()
    assert w_fast <= 1.02 * w_seq, (seed, w_fast, w_seq)


def _brute_best_glues(n: int, pa: np.ndarray, pb: np.ndarray) -> int:
    """Maximum effective glue count (|M| - forced cycle cuts) over all
    port-disjoint subsets of the candidate edges — SPSS weight equals
    weight(unitigs) - (k-1) * glues, so this is the optimal cover."""
    E = list(zip(pa.tolist(), pb.tolist()))
    best = 0
    for r in range(len(E), -1, -1):
        if r <= best:
            break
        for sub in itertools.combinations(E, r):
            ports = [p for e in sub for p in e]
            if len(set(ports)) != len(ports):
                continue
            match = {p: q for p, q in sub}
            match.update({q: p for p, q in sub})
            succ = {u: match[u] ^ 1 for u in match}
            seen: set = set()
            cycles = 0
            for i in range(n):
                if i in seen:
                    continue
                comp = {i}
                v = 2 * i
                is_cycle = False
                while v in succ:
                    v = succ[v]
                    if (v >> 1) in comp:
                        is_cycle = True
                        break
                    comp.add(v >> 1)
                if not is_cycle:
                    v = 2 * i + 1
                    while v in succ:
                        v = succ[v]
                        comp.add(v >> 1)
                seen |= comp
                if is_cycle:
                    cycles += 1
            best = max(best, len(sub) - cycles)
    return best


@pytest.mark.parametrize("seed", range(48))
def test_fast_cover_optimal_on_small_graphs(seed):
    # Generate TO the brute-force budget (<= 13 candidate edges, <= 40
    # unitigs): start from a random target size and shrink until the
    # graph fits, so every trial asserts instead of skipping (round-4
    # verdict: the size guard used to discard 23/40 draws).
    rng = np.random.default_rng(2000 + seed)
    n_target = int(rng.integers(20, 120))
    for _ in range(16):
        s = get_random_kmer_set(K, n_target, True, rng)
        unitigs = spss.get_unitigs_canonical(s)
        n = len(unitigs)
        pa, pb = spss._candidate_port_edges_canonical(unitigs, K)
        if len(pa) <= 13 and n <= 40:
            break
        n_target = max(4, (n_target * 2) // 3)
    else:
        pytest.fail(f"could not shrink to brute-force budget (seed {seed})")
    out = spss.get_spss_canonical_from_unitigs(unitigs, K, fast=True)
    d = unitigs.weight() - out.weight()
    assert d % (K - 1) == 0  # weight identity: every glue elides k-1 bases
    assert d // (K - 1) == _brute_best_glues(n, pa, pb)
