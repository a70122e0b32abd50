#!/usr/bin/env python
"""Microbenchmarks mirroring the reference's google-benchmark suite
(reference: benchmark/kmer.cc, benchmark/kmer_counter.cc,
benchmark/kmer_set.cc, benchmark/spss.cc — K=11, N=14, 1M k-mers there).

Runs on the host by default (JAX_PLATFORMS=cpu recommended); pass
--device to also time the accelerator pipelines.  Prints one
`name value unit` line per benchmark, machine-parsable like the
reference CI's benchmark job (.github/workflows/benchmark.yml:26-33).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(name: str, fn, *, unit_count: int, unit: str, reps: int = 3) -> None:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    rate = unit_count / best
    print(f"{name}\t{rate/1e6:.2f}\tM{unit}/s\t({best*1e3:.1f} ms)")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", action="store_true", help="also run device pipelines")
    parser.add_argument("--n", type=int, default=1 << 20, help="number of k-mers")
    parser.add_argument("--k", type=int, default=11)
    args = parser.parse_args()
    n, k = args.n, args.k

    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import spss as S
    from kmerset_tpu.core.kmer_set import KmerSet

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, n + k - 1).astype(np.int64)

    # Benchmark_Kmer_FromString / _Complement analog (benchmark/kmer.cc:8-30)
    kmers = kc.kmers_from_codes(codes, k)
    timeit("kmer_window_pack", lambda: kc.kmers_from_codes(codes, k), unit_count=n, unit="kmers")
    timeit("kmer_revcomp", lambda: kc.reverse_complement(kmers, k), unit_count=n, unit="kmers")

    # Benchmark_KmerCounter_ToKmerSet analog (benchmark/kmer_counter.cc:8-21)
    def count_to_set():
        can = kc.canonical(kmers, k)
        u, c = np.unique(can, return_counts=True)
        return u[c >= 2]

    timeit("counter_to_set_cutoff2", count_to_set, unit_count=n, unit="kmers")

    # Benchmark_KmerSet_Find analog (benchmark/kmer_set.cc:8-21): full scan
    A = np.unique(kc.canonical(kmers, k))
    timeit("kmer_set_scan", lambda: (A & 3) == 0, unit_count=A.size, unit="kmers")

    # Benchmark_GetUnitigsCanonical / GetSPSSCanonical / GetKmerSetFromSPSS
    # (benchmark/spss.cc:12-59)
    ks = KmerSet(k, A, _sorted=True)
    holder = {}

    def unitigs():
        holder["u"] = S.get_unitigs_canonical(ks)

    timeit("get_unitigs_canonical", unitigs, unit_count=A.size, unit="kmers", reps=1)

    def cover():
        holder["s"] = S.get_spss_canonical_from_unitigs(holder["u"], k, fast=True)

    timeit("get_spss_canonical", cover, unit_count=A.size, unit="kmers", reps=1)
    timeit(
        "get_kmer_set_from_spss",
        lambda: S.get_kmer_set_from_spss(holder["s"], k, True),
        unit_count=A.size,
        unit="kmers",
        reps=1,
    )

    if args.device:
        import jax
        import jax.numpy as jnp

        from kmerset_tpu.ops.count import count_to_set as dev_count

        codes32 = codes.astype(np.int32)
        valid = np.ones(codes32.size, dtype=bool)
        valid[-(k - 1):] = False

        def device_step():
            uniq, n_kept, _ = dev_count(jnp.asarray(codes32), jnp.asarray(valid), k, True, 1)
            jax.block_until_ready(n_kept)

        device_step()  # compile
        timeit("device_count_to_set", device_step, unit_count=n, unit="kmers")


if __name__ == "__main__":
    main()
