"""Slow-link graph wire format: 1-byte side codes -> host succ rebuild.

On slow links the graph front-end ships per-entity side codes (byte:
bit0 term_r, bits1-2 base_r, bit3 same_r, bit4 term_l, bits5-6 base_l,
bit7 same_l; ops/unitigs.device_unitig_sides) and the host rebuilds the
identical oriented successor array with one fingerprint probe per
non-terminal side (native kmerio_succ_from_sides) — 16x less wire than
the raw succ + masks.  Pins: bit-identical succ/terminals vs the direct
device front-end across all CLI k's, corrupt-stream refusal, and
byte-identical unitig output through the spss routing."""

from __future__ import annotations

import numpy as np
import pytest

from kmerset_tpu.core import native, spss
from kmerset_tpu.core.kmer_set import KmerSet
from kmerset_tpu.ops import unitigs as du
from kmerset_tpu.utils.random import get_random_kmer_set

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


@pytest.mark.parametrize("k", [15, 19, 23])
def test_sides_succ_bit_identical(monkeypatch, k):
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    rng = np.random.default_rng(k)
    s = get_random_kmer_set(k, 4000, True, rng)
    A = s.kmers
    sides = du.device_unitig_sides(A, k)
    assert sides is not None and sides.shape[0] == A.shape[0]
    succ_s = native.succ_from_sides(A, sides, k)
    assert succ_s is not None
    succ_r, term_l, term_r, both = du.device_unitig_succ(A, k)
    np.testing.assert_array_equal(succ_s, succ_r)
    np.testing.assert_array_equal((sides & 1).astype(bool), term_r)
    np.testing.assert_array_equal((sides & 16).astype(bool), term_l)
    np.testing.assert_array_equal(
        ((sides & 1) != 0) & ((sides & 16) != 0), both
    )


@pytest.mark.parametrize("k", [15, 19, 23])
def test_succ_part_edition_bit_identical(monkeypatch, k):
    """The cache-blocked partitioned succ rebuild
    (kmerio_succ_from_sides_part) is bit-identical to the fp edition,
    and refuses corrupt streams the same way."""
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    rng = np.random.default_rng(60 + k)
    s = get_random_kmer_set(k, 6000, True, rng)
    A = s.kmers
    sides = du.device_unitig_sides(A, k)
    assert sides is not None
    succ_fp = native.succ_from_sides(A, sides, k)
    assert succ_fp is not None
    monkeypatch.setattr(native, "_SUCC_PART_MIN", 1)
    lib = native.get_lib()
    if not getattr(lib, "_sfs_part", False):
        pytest.skip("partitioned edition not in this build")
    succ_part = native.succ_from_sides(A, sides, k)
    assert succ_part is not None
    np.testing.assert_array_equal(succ_part, succ_fp)
    # Corrupt stream: the partitioned probe must also refuse.
    nt = np.flatnonzero((sides & 1) == 0)
    bad = sides.copy()
    bad[nt[0]] ^= 0b110
    assert native.succ_from_sides(A, bad, k) is None


def test_sides_terminal_bits_mask_payload():
    """Terminal sides carry zeroed base/same bits (deterministic wire)."""
    k = 15
    rng = np.random.default_rng(3)
    s = get_random_kmer_set(k, 2000, True, rng)
    sides = du.device_unitig_sides(s.kmers, k)
    term_r = (sides & 1) != 0
    term_l = (sides & 16) != 0
    assert not (sides[term_r] & 0b00001110).any()
    assert not (sides[term_l] & 0b11100000).any()


def test_sides_corrupt_stream_refused():
    """A corrupted base code probes a value not in the set: the rebuild
    must return None (callers fall back) instead of a wrong graph."""
    k = 15
    rng = np.random.default_rng(5)
    s = get_random_kmer_set(k, 3000, True, rng)
    sides = du.device_unitig_sides(s.kmers, k)
    nt = np.flatnonzero((sides & 1) == 0)
    assert nt.size
    bad = sides.copy()
    bad[nt[0]] ^= 0b110
    assert native.succ_from_sides(s.kmers, bad, k) is None


@pytest.mark.parametrize("k", [15, 19])
def test_sides_routing_byte_identical_unitigs(monkeypatch, k):
    """get_unitigs_canonical through the slow-link sides route produces
    the same bytes as the fast-link (raw succ) device route and the
    host backend."""
    from kmerset_tpu.ops import backend

    rng = np.random.default_rng(40 + k)
    s = get_random_kmer_set(k, 3000, True, rng)

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    monkeypatch.setattr(backend, "_link_slow", True)
    u_sides = spss.get_unitigs_canonical(s)
    monkeypatch.setattr(backend, "_link_slow", False)
    u_succ = spss.get_unitigs_canonical(s)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    u_host = spss.get_unitigs_canonical(KmerSet(s.k, s.kmers, _sorted=True))

    np.testing.assert_array_equal(u_sides.codes, u_succ.codes)
    np.testing.assert_array_equal(u_sides.offsets, u_succ.offsets)
    np.testing.assert_array_equal(u_sides.codes, u_host.codes)
    np.testing.assert_array_equal(u_sides.offsets, u_host.offsets)
