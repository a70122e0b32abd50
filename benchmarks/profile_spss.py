#!/usr/bin/env python
"""Host-side SPSS phase profiler at 30 Mbase (the e2e roofline data).

Usage: JAX_PLATFORMS=cpu python benchmarks/profile_spss.py /tmp/g30.fasta
"""

from __future__ import annotations

import sys
import time

import numpy as np


def t(name, fn, *a, **kw):
    t0 = time.perf_counter()
    out = fn(*a, **kw)
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/g30.fasta"
    from kmerset_tpu.core import native, spss
    from kmerset_tpu.core.kmer_counter import KmerCounter
    from kmerset_tpu.core.kmer_set import KmerSet

    counter = t("count", KmerCounter.from_fasta, 15, path, "", True)
    ks, _ = t("to_kmer_set", counter.to_kmer_set, 1)
    A = ks.kmers
    print(f"n_kmers = {A.shape[0]}")

    tables = t("side_tables", native.side_tables, A, 15, True)
    t("unitig_succ_from_tables", native.unitig_succ_from_tables, tables)

    unitigs = t("get_unitigs_canonical(total)", spss.get_unitigs_canonical, ks)
    print(f"n_unitigs = {len(unitigs)}")

    P = t("first_kmers", unitigs.first_kmers, 15)
    S = t("last_kmers", unitigs.last_kmers, 15)
    res = t("overlap_edges", native.overlap_edges, P, S, 15)
    if res is not None:
        print(f"n_edges = {res[0].shape[0]}")
    t("spss(total)", spss.get_spss_canonical_from_unitigs, unitigs, 15, True)


if __name__ == "__main__":
    main()
