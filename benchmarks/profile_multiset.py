#!/usr/bin/env python
"""Phase profiler for the multi-set greedy compressor (KmerSetSet).

Generates n related sets (mutated strains of one genome, the README's
multi-set config), then times where KmerSetSet construction spends its
wall clock: SPSS builds (from_kmer_set), decodes (kmers), sketch slicing,
weight oracle batches, and the stopping-rule weight sweeps.

Usage: JAX_PLATFORMS=cpu python benchmarks/profile_multiset.py [n_sets] [mbase]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict

import numpy as np

ACC = defaultdict(float)
CNT = defaultdict(int)


def wrap(obj, name, label):
    orig = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        ACC[label] += time.perf_counter() - t0
        CNT[label] += 1
        return out

    setattr(obj, name, timed)
    return orig


def main() -> None:
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    mbase = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    eager = len(sys.argv) > 3 and sys.argv[3] == "eager"
    k = 15
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import kmer_set_set as kss_mod
    from kmerset_tpu.core import spss as spss_mod
    from kmerset_tpu.core.config import get_config
    from kmerset_tpu.core.kmer_set import KmerSet
    from kmerset_tpu.core.kmer_set_compact import KmerSetCompact

    cfg = get_config(k)
    rng = np.random.default_rng(0)
    L = int(mbase * 1e6)
    genome = rng.integers(0, 4, size=L).astype(np.int64)

    def strain_set() -> KmerSet:
        g = genome.copy()
        n_mut = int(L * 0.003)
        pos = rng.choice(L, size=n_mut, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n_mut)) % 4
        w = kc.kmers_from_codes(g, k)
        can = kc.canonical(w, k)
        return KmerSet(k, np.unique(can))

    t0 = time.perf_counter()
    kmer_sets = [strain_set() for _ in range(n_sets)]
    print(f"gen {n_sets} sets x {mbase} Mbase: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in kmer_sets]
    print(f"initial SPSS builds: {time.perf_counter()-t0:.1f}s")

    if eager:  # A/B: force the pre-round-3 eager construction
        orig_fks = KmerSetCompact.from_kmer_set.__func__

        def eager_fks(cls, kmer_set, canonical, fast=True, lazy=False):
            return orig_fks(cls, kmer_set, canonical, fast, lazy=False)

        KmerSetCompact.from_kmer_set = classmethod(eager_fks)

    # Instrument the phases the greedy loop exercises.
    o1 = wrap(KmerSetCompact, "from_kmer_set", "spss_build")
    o2 = wrap(KmerSetCompact, "kmers", "decode")
    o3 = wrap(KmerSetCompact, "sampled_kmers", "sample")
    o4 = wrap(KmerSetCompact, "weight", "weight")
    o5 = wrap(kss_mod._HostWeightOracle, "batch", "oracle_batch")
    o6 = wrap(spss_mod, "get_spss_canonical", "spss_core")

    t0 = time.perf_counter()
    kss = kss_mod.KmerSetSet(compacts, True, cfg)
    total = time.perf_counter() - t0
    print(f"KmerSetSet construction: {total:.1f}s, "
          f"{kss.size()} sets ({kss.size()-n_sets} children)")
    for label in sorted(ACC, key=lambda l: -ACC[l]):
        print(f"  {label:14s} {ACC[label]:8.2f}s  ({CNT[label]} calls)")
    acc = sum(v for k2, v in ACC.items() if k2 != "spss_core")
    print(f"  (unattributed)  {total-acc:8.2f}s")

    final_w = sum(s.weight() for s in kss.kmer_sets_compact_)
    print(f"final total weight: {final_w}")


if __name__ == "__main__":
    main()
