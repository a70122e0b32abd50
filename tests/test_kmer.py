"""Codec tests mirroring the reference's deterministic cases
(reference: test/kmer.cc:8-34) plus randomized closed-form checks."""

import numpy as np
import pytest

from kmerset_tpu.core import kmer as kc


def test_string_round_trip():
    s = "AGCTG"
    assert kc.kmer_to_string(kc.string_to_kmer(s), 5) == s


def test_complement():
    # Reference example: complement of "AACCG" is "CGGTT" (kmer.h:102).
    x = kc.string_to_kmer("AACCG")
    assert kc.kmer_to_string(int(kc.reverse_complement(np.int64(x), 5)), 5) == "CGGTT"


def test_canonical():
    x = kc.string_to_kmer("AGCTG")
    rc = int(kc.reverse_complement(np.int64(x), 5))
    assert int(kc.canonical(np.int64(x), 5)) == min(x, rc)


def test_next_prev():
    x = kc.string_to_kmer("AGCTG")
    nxt = int(kc.next_kmer(np.int64(x), 5, kc.string_to_codes("T")[0]))
    assert kc.kmer_to_string(nxt, 5) == "GCTGT"
    prv = int(kc.prev_kmer(np.int64(x), 5, kc.string_to_codes("T")[0]))
    assert kc.kmer_to_string(prv, 5) == "TAGCT"


@pytest.mark.parametrize("k", [3, 9, 15, 19, 23, 31])
def test_revcomp_random(k):
    rng = np.random.default_rng(0)
    kmers = rng.integers(0, 1 << (2 * k), size=1000, dtype=np.int64)
    rc = kc.reverse_complement(kmers, k)
    # Involution.
    np.testing.assert_array_equal(kc.reverse_complement(rc, k), kmers)
    # Matches per-base definition on a few samples.
    for x in kmers[:20]:
        s = kc.kmer_to_string(int(x), k)
        expected = s[::-1].translate(str.maketrans("ACGT", "TGCA"))
        assert kc.kmer_to_string(int(kc.reverse_complement(np.int64(x), k)), k) == expected


@pytest.mark.parametrize("k", [3, 9, 23])
def test_next_prev_random(k):
    rng = np.random.default_rng(1)
    kmers = rng.integers(0, 1 << (2 * k), size=200, dtype=np.int64)
    for c in range(4):
        nxt = kc.next_kmer(kmers, k, c)
        prv = kc.prev_kmer(kmers, k, c)
        for x, n, p in zip(kmers[:10], nxt[:10], prv[:10]):
            s = kc.kmer_to_string(int(x), k)
            assert kc.kmer_to_string(int(n), k) == s[1:] + "ACGT"[c]
            assert kc.kmer_to_string(int(p), k) == "ACGT"[c] + s[:-1]


def test_windows():
    codes = kc.string_to_codes("ACGTAC")
    kmers = kc.kmers_from_codes(codes, 3)
    assert [kc.kmer_to_string(int(x), 3) for x in kmers] == [
        "ACG", "CGT", "GTA", "TAC",
    ]


def test_bucket_key_inverse():
    # Reference: test/kmer_set.cc:10-23.
    rng = np.random.default_rng(2)
    k, n = 15, 14
    key_bits = 2 * k - n
    kmers = rng.integers(0, 1 << (2 * k), size=1000, dtype=np.int64)
    bucket, key = kc.bucket_and_key(kmers, key_bits)
    assert int(bucket.max()) < (1 << n)
    assert int(key.max()) < (1 << key_bits)
    np.testing.assert_array_equal(
        kc.kmer_from_bucket_and_key(bucket, key, key_bits), kmers
    )


def test_sorted_unique_helpers():
    from kmerset_tpu.core.arrays import sorted_unique, sorted_unique_counts

    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 5000):
        x = rng.integers(0, 300, n).astype(np.int64)
        np.testing.assert_array_equal(sorted_unique(x), np.unique(x))
        u, c = sorted_unique_counts(x)
        eu, ec = np.unique(x, return_counts=True)
        np.testing.assert_array_equal(u, eu)
        np.testing.assert_array_equal(c, ec)


def test_pallas_pack_kernels_interpret_parity():
    """The Pallas pack kernels (single and pair layouts) match the XLA
    roll formulation, via interpret mode so CI covers the kernel logic
    without a TPU (ops/pallas_pack.py)."""
    import numpy as np
    import jax

    from kmerset_tpu.ops import count as count_mod
    from kmerset_tpu.ops.pallas_pack import (
        canonical_windows_pair_pallas,
        canonical_windows_pallas,
    )

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=3000).astype(np.int32)

    for k in (9, 15):
        got = np.asarray(canonical_windows_pallas(codes, k, interpret=True))
        fwd = count_mod._pack_span(codes, range(0, k), np.int32)
        rc = count_mod._pack_span_rc(codes, range(k - 1, -1, -1), np.int32)
        exp = np.minimum(np.asarray(fwd), np.asarray(rc))
        n = codes.shape[0] - k + 1
        np.testing.assert_array_equal(got[:n], exp[:n])

    for k in (19, 23):
        hi, lo = canonical_windows_pair_pallas(codes, k, interpret=True)
        kh = (k + 1) // 2
        ehi = count_mod._pack_span(codes, range(0, kh), np.int32)
        elo = count_mod._pack_span(codes, range(kh, k), np.int32)
        rhi = count_mod._pack_span_rc(codes, range(k - 1, k - 1 - kh, -1), np.int32)
        rlo = count_mod._pack_span_rc(codes, range(k - 1 - kh, -1, -1), np.int32)
        import jax.numpy as jnp

        less = np.asarray((rhi < ehi) | ((rhi == ehi) & (rlo < elo)))
        exp_hi = np.where(less, np.asarray(rhi), np.asarray(ehi))
        exp_lo = np.where(less, np.asarray(rlo), np.asarray(elo))
        n = codes.shape[0] - k + 1
        np.testing.assert_array_equal(np.asarray(hi)[:n], exp_hi[:n])
        np.testing.assert_array_equal(np.asarray(lo)[:n], exp_lo[:n])
