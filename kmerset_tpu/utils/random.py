"""Random test-data generators (reference: lib/random.h:18-134).

Unlike the reference's unseeded absl::InsecureBitGen (which makes its tests
and even its production bucket sampling nondeterministic run-to-run,
reference: lib/core/random.h:17), everything here takes an explicit
numpy Generator so failures reproduce.
"""

from __future__ import annotations

import numpy as np

from ..core import kmer as kmer_ops
from ..core.kmer_set import KmerSet


def get_random_kmer(k: int, rng: np.random.Generator) -> int:
    return int(rng.integers(0, 1 << (2 * k), dtype=np.int64))


def get_random_read(k: int, rng: np.random.Generator) -> str:
    """1-100 random k-mers concatenated; 50% self-doubled to force loops
    (reference: lib/random.h:38-53)."""
    n = int(rng.integers(1, 101))
    kmers = rng.integers(0, 1 << (2 * k), size=n, dtype=np.int64)
    codes = kmer_ops.codes_from_kmer(kmers, k).reshape(-1)
    s = kmer_ops.codes_to_string(codes)
    if int(rng.integers(0, 2)) == 0:
        s += s
    return s


def get_random_kmers(k: int, n: int, rng: np.random.Generator) -> np.ndarray:
    out: set[int] = set()
    while len(out) < n:
        out.update(
            int(x) for x in rng.integers(0, 1 << (2 * k), size=n, dtype=np.int64)
        )
    return np.array(sorted(out)[:n], dtype=np.int64)


def get_random_kmer_set(
    k: int, n: int, canonical: bool, rng: np.random.Generator
) -> KmerSet:
    """Builds a KmerSet of ~n k-mers from random reads so the de Bruijn
    graph has real paths and loops (reference: lib/random.h:80-102)."""
    collected: list[np.ndarray] = []
    total = 0
    while total < n:
        read = get_random_read(k, rng)
        codes = kmer_ops.string_to_codes(read)
        kmers = kmer_ops.kmers_from_codes(codes, k)
        if canonical:
            kmers = kmer_ops.canonical(kmers, k)
        collected.append(kmers)
        total += kmers.shape[0]
    allk = np.unique(np.concatenate(collected))
    return KmerSet(k, allk[: n if n < allk.shape[0] else allk.shape[0]], _sorted=True)
