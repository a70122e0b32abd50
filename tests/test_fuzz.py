"""Re-randomized SPSS fuzz (the reference's CI reruns its Random tests 10x
with fresh entropy each run — test.yml:28; fixed-seed property tests don't
re-randomize, so this one draws a fresh seed per process and prints it on
failure for reproduction)."""

import os

import numpy as np
import pytest

from kmerset_tpu.core import kmer as kc
from kmerset_tpu.core import spss
from kmerset_tpu.core.kmer_set import KmerSet
from kmerset_tpu.utils.random import get_random_kmer_set

SEED = int(os.environ.get("KMERSET_TPU_TEST_SEED", "0")) or int.from_bytes(
    os.urandom(4), "little"
)


def _fresh_kmers(strings, k, canonical):
    """Every k-mer across all strings appears exactly once (the SPSS
    freshness invariant, reference: test/spss.cc:33-37)."""
    seen = []
    for s in range(len(strings)):
        codes = strings.get_codes(s).astype(np.int64)
        assert codes.shape[0] >= k
        w = kc.kmers_from_codes(codes, k)
        if canonical:
            w = kc.canonical(w, k)
        seen.append(w)
    allk = np.concatenate(seen) if seen else np.empty(0, np.int64)
    assert np.unique(allk).shape[0] == allk.shape[0], f"seed={SEED}"
    return np.unique(allk)


@pytest.mark.random
@pytest.mark.parametrize("trial", range(5))
def test_spss_fuzz_random_seed(trial):
    rng = np.random.default_rng(SEED + trial)
    # Odd k (canonical contract) across every key layout: one-int32-lane
    # (k <= 15), int32 pair (k <= 23), int64 (k <= 31).
    k = int(rng.integers(2, 16)) * 2 + 1
    n = int(rng.integers(1, 1 << 12))
    ks = get_random_kmer_set(k, n, True, rng)
    out = spss.get_spss_canonical(ks, fast=bool(rng.integers(0, 2)))
    uniq = _fresh_kmers(out, k, True)
    assert np.array_equal(uniq, ks.kmers), f"seed={SEED} k={k} n={n}"
    rt = spss.get_kmer_set_from_spss(out, k, True)
    assert rt.equals(KmerSet(k, ks.kmers, _sorted=True)), f"seed={SEED}"


@pytest.mark.random
@pytest.mark.parametrize("trial", range(3))
def test_spss_plain_fuzz_random_seed(trial):
    """Non-canonical family (GetSPSS, reference: lib/core/spss.h:698-1016):
    freshness + reconstruction under fresh entropy, any k in [2, 31]."""
    rng = np.random.default_rng(SEED + 1000 + trial)
    k = int(rng.integers(2, 32))
    n = int(rng.integers(1, 1 << 12))
    ks = get_random_kmer_set(k, n, False, rng)
    out = spss.get_spss(ks)
    uniq = _fresh_kmers(out, k, False)
    assert np.array_equal(uniq, ks.kmers), f"seed={SEED} k={k} n={n}"
    rt = spss.get_kmer_set_from_spss(out, k, False)
    assert rt.equals(KmerSet(k, ks.kmers, _sorted=True)), f"seed={SEED}"


def test_even_k_canonical_rejected():
    """Even k admits palindromic k-mers; the canonical pipeline must
    refuse rather than silently emit duplicate k-mers."""
    rng = np.random.default_rng(0)
    ks = get_random_kmer_set(10, 100, True, rng)
    with pytest.raises(ValueError, match="odd k"):
        spss.get_spss_canonical(ks)
