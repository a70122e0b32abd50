"""Count -> graph device-resident fusion (ops/resident.py).

The device counting pipeline keeps its sorted unique array on the
accelerator (a DeviceKmers handle riding KmerCounter -> KmerSet), and the
SPSS graph front-end consumes it without re-uploading.  These tests force
the device backend (XLA-CPU here) and pin: handle integrity checks, the
on-device cutoff filter against the host filter, byte-identical SPSS
output with and without the handle, and that the fused path really skips
the upload staging."""

from __future__ import annotations

import numpy as np
import pytest

from kmerset_tpu.core import spss
from kmerset_tpu.core.kmer_counter import KmerCounter
from kmerset_tpu.core.kmer_set import KmerSet


def _reads(k: int, seed: int, n_reads: int = 40) -> list:
    from kmerset_tpu.utils.random import get_random_read

    rng = np.random.default_rng(seed)
    return [get_random_read(k, rng) for _ in range(n_reads)]


@pytest.mark.parametrize("k", [15, 19, 23])
def test_resident_handle_rides_counter_to_set(monkeypatch, k):
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    reads = _reads(k, seed=k)
    counter = KmerCounter.from_reads(k, reads, canonical=True)
    assert counter._device is not None
    assert counter._device.valid_for(counter.kmers, k)
    ks, n_cut = counter.to_kmer_set(1)
    assert n_cut == 0
    assert ks.device is not None
    assert ks.device.valid_for(ks.kmers, k)
    # The handle mirrors the host array exactly (prefix of the padded
    # device array equals the authoritative host kmers).
    arr = np.asarray(ks.device.graph_input())[: ks.size()].astype(np.int64)
    np.testing.assert_array_equal(arr, ks.kmers)


@pytest.mark.parametrize("cutoff", [2, 3])
def test_resident_cutoff_filter_matches_host(monkeypatch, cutoff):
    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    # Duplicate reads so counts spread across the cutoff.
    reads = _reads(k, seed=7, n_reads=30)
    reads = reads + reads[::2] + reads[::3]
    counter = KmerCounter.from_reads(k, reads, canonical=True)
    assert counter._device is not None
    ks, n_cut = counter.to_kmer_set(cutoff)
    assert n_cut > 0, "fixture must actually cut something"
    assert ks.device is not None, "device-side filter should survive"
    assert ks.device.n == ks.size()
    arr = np.asarray(ks.device.graph_input())[: ks.size()].astype(np.int64)
    np.testing.assert_array_equal(arr, ks.kmers)


def test_filtered_endpoint_check_reads_device(monkeypatch):
    """with_verified_endpoints must read the device array's actual
    endpoints: a host array with the same cardinality but different
    values (a diverged filter) must drop the handle, not validate it
    (round-4 advisor finding: the old stamp made the check vacuous)."""
    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    reads = _reads(k, seed=19, n_reads=30)
    reads = reads + reads[::2]
    counter = KmerCounter.from_reads(k, reads, canonical=True)
    dh = counter._device.filtered(2, 255)
    assert dh is not None and dh.n > 1
    true_keys = np.asarray(dh.graph_input())[: dh.n].astype(np.int64)
    ok = dh.with_verified_endpoints(true_keys)
    assert ok is not None and ok.valid_for(true_keys, k)
    # Same cardinality, diverged values: must refuse.
    wrong = true_keys.copy()
    wrong[0] += 1
    dh2 = counter._device.filtered(2, 255)
    assert dh2.with_verified_endpoints(wrong) is None


def test_dedup_edges_zero_zero_edge_refused():
    from kmerset_tpu.core import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    a = np.array([0, 2, 0], dtype=np.int64)
    b = np.array([0, 3, 0], dtype=np.int64)
    # The (0,0) edge's packed key aliases the empty-slot marker: the C
    # pass must refuse (None) so the numpy dedup handles it.
    assert native.dedup_edges(a, b) is None
    # Sanity: without the aliasing edge the C pass works.
    idx = native.dedup_edges(np.array([1, 2, 1]), np.array([0, 3, 0]))
    assert idx is not None and idx.tolist() == [0, 1]


def test_resident_value_max_saturation(monkeypatch):
    """The on-device filter saturates counts at value_max exactly like
    the host AddWithMax semantics (reference: lib/core/kmer_counter.h:28-38):
    with value_max=2 and cutoff=3 nothing can survive, however often a
    k-mer occurred."""
    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    reads = _reads(k, seed=11, n_reads=10)
    counter = KmerCounter.from_reads(k, reads * 5, canonical=True, value_max=2)
    ks, n_cut = counter.to_kmer_set(3)
    assert ks.size() == 0
    assert n_cut == counter.size()


def test_resident_stale_handle_is_ignored(monkeypatch):
    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=3), canonical=True)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None
    # Attach the handle to a DIFFERENT set: valid_for must refuse it and
    # the SPSS build must fall back to the upload path, still correct.
    other = KmerSet(k, ks.kmers[:-1], _sorted=True)
    other.device = ks.device
    assert not ks.device.valid_for(other.kmers, k)
    unitigs = spss.get_unitigs_canonical(other)
    rt = spss.get_kmer_set_from_spss(unitigs, k, True)
    np.testing.assert_array_equal(rt.kmers, other.kmers)


@pytest.mark.parametrize("k", [15, 19])
def test_resident_spss_byte_identical_and_skips_upload(monkeypatch, k):
    """get_unitigs_canonical through the resident handle produces the
    same bytes as the upload-staged device path AND never stages a host
    array (pad_pow2 untouched) — the fusion contract."""
    from kmerset_tpu.ops import neighbors as nb
    from kmerset_tpu.ops import unitigs as ut

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=k + 1), canonical=True)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None

    staged = {"n": 0}

    def spy(a, fill):
        staged["n"] += 1
        return nb.pad_pow2(a, fill)

    monkeypatch.setattr(ut, "pad_pow2", spy)
    u_res = spss.get_unitigs_canonical(ks)
    assert staged["n"] == 0, "resident path must not stage/upload the set"

    bare = KmerSet(k, ks.kmers, _sorted=True)  # same set, no handle
    u_dev = spss.get_unitigs_canonical(bare)
    np.testing.assert_array_equal(u_res.codes, u_dev.codes)
    np.testing.assert_array_equal(u_res.offsets, u_dev.offsets)

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    u_host = spss.get_unitigs_canonical(bare)
    np.testing.assert_array_equal(u_res.codes, u_host.codes)
    np.testing.assert_array_equal(u_res.offsets, u_host.offsets)


def test_resident_plain_directed_graph(monkeypatch):
    """Non-canonical counters carry the handle too; for k <= 15 the
    int32 canonical lane layout does not match the plain path, which
    must quietly use the upload path (k=19 int64 layout matches)."""
    k = 19
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=5), canonical=False)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None
    u_res = spss.get_unitigs(ks)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    bare = KmerSet(k, ks.kmers, _sorted=True)
    u_host = spss.get_unitigs(bare)
    np.testing.assert_array_equal(u_res.codes, u_host.codes)
    np.testing.assert_array_equal(u_res.offsets, u_host.offsets)


def test_spss_ahead_opens_slow_link_count_gate(monkeypatch):
    """A count that feeds an SPSS build in the same process opens the
    device gate at the graph threshold on slow links (the combined
    pipeline amortizes the link over both phases); a bare count keeps
    the counting slow-link factor."""
    from kmerset_tpu.ops import backend

    monkeypatch.delenv("KMERSET_TPU_FORCE_BACKEND", raising=False)
    monkeypatch.setattr(backend, "_link_slow", True)
    monkeypatch.setattr(backend, "_cpu_backend", lambda: False)
    monkeypatch.setattr(backend, "_backend_alive", lambda: True)
    n = backend._graph_threshold()
    assert not backend.should_use_device(n)
    assert backend.should_use_device(n, spss_ahead=True)
    assert not backend.should_use_device(n - 1, spss_ahead=True)
    # Fast link: unchanged behavior either way.
    monkeypatch.setattr(backend, "_link_slow", False)
    assert backend.should_use_device(n)
    assert backend.should_use_device(n, spss_ahead=True)
    # The ceilings still hold with the hint.
    assert not backend.should_use_device(
        backend.MAX_DEVICE_WINDOWS + 1, spss_ahead=True
    )


def test_slow_link_gate_is_wire_aware(monkeypatch):
    """On a slow link the spss_ahead arm only opens when the key
    download has a compact wire format for the worst-case key count:
    sparse keyspaces (k=23) would pay the raw 8 B/key transfer —
    measured 6.5 s vs a 1.8-4 s host count at 16.7M keys — so the gate
    must refuse them while still opening for k=15 (delta-compressible)
    and for inputs small enough that raw is cheap."""
    from kmerset_tpu.ops import backend

    monkeypatch.delenv("KMERSET_TPU_FORCE_BACKEND", raising=False)
    monkeypatch.setattr(backend, "_link_slow", True)
    monkeypatch.setattr(backend, "_cpu_backend", lambda: False)
    monkeypatch.setattr(backend, "_backend_alive", lambda: True)
    n = 16_700_000
    assert n >= backend._graph_threshold()
    assert backend.should_use_device(n, spss_ahead=True, k=15)
    assert not backend.should_use_device(n, spss_ahead=True, k=23)
    # k=19 stays open: its keyspace is dense enough for uint16 deltas
    # (~46 MB wire at this n — the plan itself decides, not the k).
    assert backend.should_use_device(n, spss_ahead=True, k=19)
    # Small inputs: raw download is cheap, any k passes.
    small = backend._graph_threshold()
    if small * 8 <= (32 << 20):
        assert backend.should_use_device(small, spss_ahead=True, k=23)
    # Without the k hint: previous behavior (callers that cannot know).
    assert backend.should_use_device(n, spss_ahead=True)


@pytest.mark.parametrize("k", [15, 19])
def test_prefetched_sides_match_and_skip_recompute(monkeypatch, k):
    """prefetch_sides (the count-phase async dispatch) yields the exact
    bytes the on-demand side-code jit would, and device_unitig_sides
    collects the prefetched array without re-running the jit."""
    from kmerset_tpu.ops import unitigs as ut

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=k + 2), canonical=True)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None and ks.device.sides is None

    baseline = ut.device_unitig_sides(ks.kmers, k, resident=ks.device)
    assert baseline is not None

    ks.device.prefetch_sides()
    assert ks.device.sides is not None

    def boom(*a, **kw):
        raise AssertionError("prefetched sides must not be recomputed")

    monkeypatch.setattr(ut, "_unitig_sides", boom)
    got = ut.device_unitig_sides(ks.kmers, k, resident=ks.device)
    np.testing.assert_array_equal(got, baseline)


def test_prefetch_sides_noncanonical_noop_and_failure_silent(monkeypatch):
    """Non-canonical handles refuse the prefetch (the side-code format is
    canonical-only); a failing dispatch leaves sides=None so the graph
    phase just recomputes."""
    from kmerset_tpu.ops import unitigs as ut

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    k = 19
    counter = KmerCounter.from_reads(k, _reads(k, seed=8), canonical=False)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None
    ks.device.prefetch_sides()
    assert ks.device.sides is None

    counter2 = KmerCounter.from_reads(k, _reads(k, seed=8), canonical=True)
    ks2, _ = counter2.to_kmer_set(1)
    assert ks2.device is not None

    def boom(*a, **kw):
        raise RuntimeError("synthetic dispatch failure")

    monkeypatch.setattr(ut, "dispatch_sides", boom)
    ks2.device.prefetch_sides()
    assert ks2.device.sides is None


def test_slow_link_build_uses_prefetched_sides(monkeypatch):
    """End-to-end: a slow-link spss_ahead count dispatches the side-code
    prefetch, and the subsequent canonical SPSS build consumes it — same
    strings as the host backend."""
    from kmerset_tpu.ops import backend

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    monkeypatch.setattr(backend, "_link_slow", True)
    # The prefetch mirrors should_use_device_graph's lower bound (below
    # it the SPSS phase routes host-side and the prefetch would be
    # wasted); open the gate at this fixture's size.
    monkeypatch.setenv("KMERSET_TPU_MIN_DEVICE_GRAPH", "1")
    k = 15
    reads = _reads(k, seed=13)
    counter = KmerCounter.from_reads(k, reads, canonical=True, spss_ahead=True)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None
    assert ks.device.sides is not None, "spss_ahead slow-link count must prefetch"
    u_res = spss.get_unitigs_canonical(ks)

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    bare = KmerSet(k, ks.kmers, _sorted=True)
    u_host = spss.get_unitigs_canonical(bare)
    np.testing.assert_array_equal(u_res.codes, u_host.codes)
    np.testing.assert_array_equal(u_res.offsets, u_host.offsets)


def test_resident_incremental_add_invalidates(monkeypatch):
    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=9), canonical=True)
    assert counter._device is not None
    counter.add(5)
    counter.size()  # flush
    assert counter._device is None
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is None


@pytest.mark.parametrize("lazy", [False, True])
def test_compact_build_keeps_resident_fusion(monkeypatch, lazy):
    """KmerSetCompact.from_kmer_set (the CLI build path) must carry the
    device handle into its deferred SPSS build: the front-end consumes
    the resident array without re-staging (regression: _pending dropped
    the handle and every compact build silently took the upload path)."""
    from kmerset_tpu.core.kmer_set_compact import KmerSetCompact
    from kmerset_tpu.ops import neighbors as nb
    from kmerset_tpu.ops import unitigs as ut

    k = 15
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    counter = KmerCounter.from_reads(k, _reads(k, seed=21), canonical=True)
    ks, _ = counter.to_kmer_set(1)
    assert ks.device is not None

    staged = {"n": 0}

    def spy(a, fill):
        staged["n"] += 1
        return nb.pad_pow2(a, fill)

    monkeypatch.setattr(ut, "pad_pow2", spy)
    compact = KmerSetCompact.from_kmer_set(ks, canonical=True, lazy=lazy)
    strings = compact.spss
    assert staged["n"] == 0, "compact build must not re-stage a resident set"

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    bare = KmerSet(k, ks.kmers, _sorted=True)
    host = KmerSetCompact.from_kmer_set(bare, canonical=True)
    np.testing.assert_array_equal(strings.codes, host.spss.codes)
    np.testing.assert_array_equal(strings.offsets, host.spss.offsets)
