"""Gap-encoded key downloads (ops/deltas.py) and the deferred counts
transfer (ops/backend.device_count lazy_counts -> KmerCounter.counts).

The delta wire format replaces the raw sorted-key download on slow
links; these tests pin byte-exact reconstruction (including escape
positions and the leading absolute value), the density heuristic, the
overflow fallback, and that the lazy counts closure defers the transfer
until a host access actually needs it."""

from __future__ import annotations

import numpy as np
import pytest

from kmerset_tpu.ops import backend, deltas


def _device_sorted(values: np.ndarray, pad_to: int | None = None):
    import jax.numpy as jnp

    a = np.asarray(values, dtype=np.int64)
    if pad_to and pad_to > a.shape[0]:
        a = np.concatenate(
            [a, np.full(pad_to - a.shape[0], np.iinfo(np.int64).max - 1)]
        )
    return jnp.asarray(a)


def test_plan_escape_density_tiers():
    # Canonical keys fall off linearly across the keyspace (density
    # (2/S)(1-u/S)), so a dense k=15 set has ~535k gaps over 255
    # (measured at n=16.5M; the old uniform model predicted 6.5k and
    # every production build silently fell back to the raw download).
    # uint8 still wins there — but only with an adaptive exception
    # table sized from the density model, in int32 rows.
    esc, cap, narrow = deltas.plan_escape(16_500_000, 15, True)
    assert esc == 255 and narrow
    assert cap >= 535_000 * 1.3  # room for the measured overflow count
    # Medium density: the u8 exception table would outgrow its saving;
    # u16 with the base table wins.
    esc, cap, narrow = deltas.plan_escape(4_000_000, 15, True)
    assert esc == 65535 and cap == deltas.CAP
    # Sparse k=23 set: mean gap >> u16 range; nothing beats raw.
    assert deltas.plan_escape(1_000_000, 23, True) is None
    assert deltas.plan_escape(0, 15, True) is None
    # NON-canonical keys really are uniform: a very dense k=15 set
    # (mean gap ~11 << 255) fits u8 with the base table.
    esc, cap, narrow = deltas.plan_escape(100_000_000, 15, False)
    assert esc == 255 and cap == deltas.CAP
    # expected_escape (width-only view) delegates to the plan.
    assert deltas.expected_escape(4_000_000, 15, True) == 65535


def test_cap_class_rounding():
    assert deltas._cap_class(1) == 1
    assert deltas._cap_class(65536) == 65536
    assert deltas._cap_class(65537) == 3 << 15
    assert deltas._cap_class((3 << 15) + 1) == 1 << 17
    assert deltas._cap_class(749_000) == 3 << 18


@pytest.mark.parametrize("esc_case", ["dense", "escapes", "big_first"])
def test_delta_roundtrip_exact(monkeypatch, esc_case):
    rng = np.random.default_rng(hash(esc_case) % 2**31)
    if esc_case == "dense":
        vals = np.unique(rng.integers(0, 1 << 22, size=40_000))
    elif esc_case == "escapes":
        # Mostly small gaps with scattered >255 jumps.
        gaps = rng.integers(1, 100, size=30_000).astype(np.int64)
        gaps[rng.integers(0, 30_000, size=500)] += 100_000
        vals = np.cumsum(gaps)
    else:
        # Leading value overflows the escape width: position-0 exception.
        vals = np.cumsum(
            np.concatenate([[1 << 28], rng.integers(1, 50, size=20_000)])
        ).astype(np.int64)
    n = vals.shape[0]
    uniq = _device_sorted(vals, pad_to=1 << 16 if n < (1 << 16) else None)
    monkeypatch.setattr(
        deltas, "plan_escape", lambda *a, **kw: (255, deltas.CAP, False)
    )
    out = deltas.device_delta_download(uniq, n, 15, True)
    assert out is not None
    np.testing.assert_array_equal(out, vals)


def test_delta_narrow_int32_exceptions_roundtrip(monkeypatch):
    """uint8 deltas + int32 exception rows (the adaptive-table plan for
    dense canonical k<=15 sets) reconstruct byte-exactly."""
    rng = np.random.default_rng(41)
    gaps = rng.integers(1, 60, size=40_000).astype(np.int64)
    gaps[rng.integers(0, 40_000, size=900)] += 500_000
    vals = np.cumsum(gaps)
    assert vals[-1] < (1 << 31)  # narrow row validity domain
    uniq = _device_sorted(vals)
    monkeypatch.setattr(
        deltas, "plan_escape", lambda *a, **kw: (255, 1 << 10, True)
    )
    out = deltas.device_delta_download(uniq, vals.shape[0], 15, True)
    assert out is not None
    np.testing.assert_array_equal(out, vals)


def test_delta_u16_roundtrip(monkeypatch):
    rng = np.random.default_rng(7)
    gaps = rng.integers(1, 20_000, size=50_000).astype(np.int64)
    gaps[rng.integers(0, 50_000, size=200)] += 1 << 20
    vals = np.cumsum(gaps)
    uniq = _device_sorted(vals)
    monkeypatch.setattr(
        deltas, "plan_escape", lambda *a, **kw: (65535, deltas.CAP, False)
    )
    out = deltas.device_delta_download(uniq, vals.shape[0], 19, True)
    assert out is not None
    np.testing.assert_array_equal(out, vals)


def test_delta_overflow_falls_back(monkeypatch):
    # Every gap escapes -> n_over > CAP -> decoder refuses (raw fallback).
    n = deltas.CAP + 1024
    vals = np.arange(n, dtype=np.int64) * 1000 + 5
    uniq = _device_sorted(vals)
    monkeypatch.setattr(
        deltas, "plan_escape", lambda *a, **kw: (255, deltas.CAP, False)
    )
    assert deltas.device_delta_download(uniq, n, 15, True) is None


def test_device_count_delta_path_matches_host(monkeypatch):
    """device_count with the slow-link delta gate open returns the same
    keys/counts as the host counting path."""
    from kmerset_tpu.core.kmer_counter import KmerCounter
    from kmerset_tpu.utils.random import get_random_read

    k = 15
    rng = np.random.default_rng(3)
    reads = [get_random_read(k, rng) for _ in range(60)]
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    monkeypatch.setattr(backend, "_link_slow", True)
    monkeypatch.setattr(backend, "DELTA_MIN_KEYS", 256)
    dev = KmerCounter.from_reads(k, reads, canonical=True)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    host = KmerCounter.from_reads(k, reads, canonical=True)
    np.testing.assert_array_equal(dev.kmers, host.kmers)
    np.testing.assert_array_equal(dev.counts, host.counts)


def test_lazy_counts_defers_until_needed(monkeypatch):
    """spss_ahead device counts defer the counts transfer: size() and the
    cutoff<=1 to_kmer_set never materialize them; get()/cutoff>1 do, with
    values identical to the host path."""
    from kmerset_tpu.core.kmer_counter import KmerCounter
    from kmerset_tpu.utils.random import get_random_read

    k = 15
    rng = np.random.default_rng(5)
    reads = [get_random_read(k, rng) for _ in range(40)]
    reads = reads + reads[::2]
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, reads, canonical=True, spss_ahead=True)
    assert counter._counts is None and counter._counts_fetch is not None
    n = counter.size()
    ks, n_cut = counter.to_kmer_set(1)
    assert n_cut == 0 and ks.size() == n
    assert counter._counts is None, "cutoff<=1 flow must not fetch counts"

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    host = KmerCounter.from_reads(k, reads, canonical=True)
    some = int(host.kmers[len(host.kmers) // 2])
    assert counter.get(some) == host.get(some)  # forces the fetch
    assert counter._counts is not None
    np.testing.assert_array_equal(counter.counts, host.counts)


def test_frag_validity_device_count_parity(monkeypatch):
    """count_kmers_frag's on-device validity mask (scatter + reverse
    cummin over the boundary array) reproduces the host window_validity
    semantics on boundary-heavy inputs: many short fragments, fragments
    shorter than k, and back-to-back boundaries."""
    from kmerset_tpu.core.kmer_counter import KmerCounter

    k = 11
    rng = np.random.default_rng(17)
    reads = []
    for _ in range(120):
        ln = int(rng.integers(3, 40))  # many below k
        reads.append("".join("ACGT"[c] for c in rng.integers(0, 4, size=ln)))
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    dev = KmerCounter.from_reads(k, reads, canonical=True)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    host = KmerCounter.from_reads(k, reads, canonical=True)
    np.testing.assert_array_equal(dev.kmers, host.kmers)
    np.testing.assert_array_equal(dev.counts, host.counts)


def test_native_delta_decode_matches_numpy_and_rejects_bad_exc():
    from kmerset_tpu.core import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(23)
    gaps = rng.integers(1, 200, size=10_000).astype(np.int64)
    big = rng.choice(10_000, size=40, replace=False)
    gaps[big] += 5_000
    vals = np.cumsum(gaps)
    d = np.minimum(gaps, 255).astype(np.uint8)
    idx = np.sort(np.flatnonzero(gaps >= 255))
    exc = np.stack([idx, gaps[idx]], axis=1).astype(np.int64)
    out = native.delta_decode(d, exc, exc.shape[0])
    np.testing.assert_array_equal(out, vals)
    # u16 width
    d16 = np.minimum(gaps, 65535).astype(np.uint16)
    out16 = native.delta_decode(d16, exc[:0], 0)
    np.testing.assert_array_equal(out16, vals)
    # Out-of-order exception positions: decoder must refuse.
    if exc.shape[0] >= 2:
        bad = exc[::-1].copy()
        assert native.delta_decode(d, bad, bad.shape[0]) is None


def test_lazy_counts_failure_recovers_via_host_recount(monkeypatch):
    """A deferred counts transfer that fails (device died post-count)
    degrades to a host recount aligned to the device keys — same values
    the eager path would have produced — instead of crashing or losing
    the counts permanently."""
    from kmerset_tpu.core.kmer_counter import KmerCounter
    from kmerset_tpu.utils.random import get_random_read

    k = 15
    rng = np.random.default_rng(31)
    reads = [get_random_read(k, rng) for _ in range(40)]
    reads = reads + reads[::3]
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, reads, canonical=True, spss_ahead=True)
    assert counter._counts_fetch is not None and counter._recover is not None

    def boom():
        raise RuntimeError("synthetic transfer failure")

    counter._counts_fetch = boom
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    host = KmerCounter.from_reads(k, reads, canonical=True)
    np.testing.assert_array_equal(counter.counts, host.counts)  # recounted
    assert counter._recover is None  # recovery state released


def test_zeroed_scratch_is_thread_local():
    from kmerset_tpu.core import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    import threading

    bufs = {}

    def grab(name):
        bufs[name] = native._zeroed_u64(20, slot=0)

    t = threading.Thread(target=grab, args=("other",))
    t.start()
    t.join()
    grab("main")
    assert bufs["main"] is not bufs["other"]
    # Same thread, same slot: reused and re-zeroed.
    b = native._zeroed_u64(20, slot=0)
    assert b is bufs["main"] and int(b[123]) == 0
