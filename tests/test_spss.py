"""SPSS property tests, mirroring the reference's randomized invariants
(reference: test/spss.cc): every output string has length >= k, every k-mer
of the input appears exactly once across the whole output, and decoding
reproduces the input set exactly."""

import numpy as np
import pytest

from kmerset_tpu.core import kmer as kc
from kmerset_tpu.core import spss
from kmerset_tpu.core.kmer_set import KmerSet
from kmerset_tpu.core.strings import PackedStrings
from kmerset_tpu.utils.random import get_random_kmer_set

K = 9


def _check_spss_invariants(kmer_set: KmerSet, out: PackedStrings, canonical: bool):
    k = kmer_set.k
    lens = out.lengths()
    assert (lens >= k).all()
    kmers = out.all_kmers(k, canonical)
    # Freshness: every k-mer appears exactly once across the whole output
    # (reference: test/spss.cc:33-37,62-66,117-122).
    uniq, counts = np.unique(kmers, return_counts=True)
    assert (counts == 1).all(), f"{np.count_nonzero(counts > 1)} duplicated k-mers"
    # Reconstruction equality (reference: test/spss.cc:40,68,96,124).
    np.testing.assert_array_equal(uniq, kmer_set.kmers)


@pytest.mark.parametrize("seed", range(8))
def test_unitigs_canonical_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 1 << 12))
    s = get_random_kmer_set(K, n, True, rng)
    out = spss.get_unitigs_canonical(s)
    _check_spss_invariants(s, out, canonical=True)


@pytest.mark.parametrize("seed", range(8))
def test_unitigs_random(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 1 << 12))
    s = get_random_kmer_set(K, n, False, rng)
    out = spss.get_unitigs(s)
    _check_spss_invariants(s, out, canonical=False)


@pytest.mark.parametrize("seed", range(8))
def test_spss_canonical_fast_random(seed):
    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1, 1 << 12))
    s = get_random_kmer_set(K, n, True, rng)
    out = spss.get_spss_canonical(s, fast=True)
    _check_spss_invariants(s, out, canonical=True)


@pytest.mark.slow
@pytest.mark.parametrize("backend_name", ["host", "device", "mesh"])
def test_spss_canonical_reference_scale_random(monkeypatch, backend_name):
    """Round-trip property at the reference's randomized-size ceiling
    (n up to 2^16, test/spss.cc:15-23) across backends: the large-n
    regime is where the mesh/native/doubling paths could diverge, and
    the small-n tiers never reach it.  All backends must produce sets
    that reconstruct exactly; host vs forced backends must agree
    byte-for-byte on the emitted strings."""
    rng = np.random.default_rng(4242)
    s = get_random_kmer_set(K, 1 << 16, True, rng)
    assert s.size() > (1 << 14)  # genuinely large after dedup
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    want = spss.get_spss_canonical(s, fast=True)
    _check_spss_invariants(s, want, canonical=True)
    if backend_name == "host":
        return
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", backend_name)
    got = spss.get_spss_canonical(s, fast=True)
    _check_spss_invariants(s, got, canonical=True)
    np.testing.assert_array_equal(got.codes, want.codes)
    np.testing.assert_array_equal(got.offsets, want.offsets)


@pytest.mark.parametrize("seed", range(4))
def test_spss_canonical_slow_random(seed):
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(1, 1 << 11))
    s = get_random_kmer_set(K, n, True, rng)
    out = spss.get_spss_canonical(s, fast=False)
    _check_spss_invariants(s, out, canonical=True)


@pytest.mark.parametrize("seed", range(8))
def test_spss_random(seed):
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(1, 1 << 12))
    s = get_random_kmer_set(K, n, False, rng)
    out = spss.get_spss(s)
    _check_spss_invariants(s, out, canonical=False)


def test_spss_weight_not_worse_than_unitigs():
    # The path cover must not increase total weight.
    rng = np.random.default_rng(7)
    s = get_random_kmer_set(K, 3000, True, rng)
    unitigs = spss.get_unitigs_canonical(s)
    out = spss.get_spss_canonical(s, fast=True)
    assert out.weight() <= unitigs.weight()
    assert len(out) <= len(unitigs)


def test_single_kmer():
    x = kc.string_to_kmer("ACGTACGTA")
    can = int(kc.canonical(np.int64(x), K))
    s = KmerSet(K, np.array([can]))
    out = spss.get_spss_canonical(s)
    assert len(out) == 1
    _check_spss_invariants(s, out, canonical=True)


def test_simple_path():
    # One linear path: ACGTACGTAC + shifts.
    read = "ACGTAACCGGTTACGT"
    codes = kc.string_to_codes(read)
    kmers = kc.canonical(kc.kmers_from_codes(codes, K), K)
    s = KmerSet(K, kmers)
    out = spss.get_unitigs_canonical(s)
    _check_spss_invariants(s, out, canonical=True)
    out2 = spss.get_spss_canonical(s)
    _check_spss_invariants(s, out2, canonical=True)


def test_pure_cycle():
    # A cyclic sequence: every node has in/out degree 1.
    base = "ACGGTCAGTT"
    read = base * 3  # wraps around with k=9 < len(base)*2
    codes = kc.string_to_codes(read)
    kmers = kc.kmers_from_codes(codes, K)
    s = KmerSet(K, kmers)
    out = spss.get_unitigs(s)
    _check_spss_invariants(s, out, canonical=False)


def test_reconstruction_round_trip():
    rng = np.random.default_rng(11)
    s = get_random_kmer_set(K, 2000, True, rng)
    out = spss.get_spss_canonical(s)
    back = spss.get_kmer_set_from_spss(out, K, True)
    assert back.equals(s)


def test_chain_walk_kept_native_parity():
    """The native measure-then-emit-winners chain walk
    (kmerio_chain_lens_ends/chain_emit) produces the same unitig string
    set as the walk-everything-and-filter fallback (reference skip rule,
    lib/core/spss.h:511,555)."""
    import kmerset_tpu.core.native as nat

    if nat.get_lib() is None:
        pytest.skip("native lib not built")
    for trial in range(3):
        rng = np.random.default_rng(500 + trial)
        ks = get_random_kmer_set(9, int(rng.integers(100, 1 << 13)), True, rng)
        a = spss.get_unitigs_canonical(ks)
        lib = nat._LIB
        nat._LIB = None
        try:
            b = spss.get_unitigs_canonical(ks)
        finally:
            nat._LIB = lib
        assert sorted(a.to_strings()) == sorted(b.to_strings())


def test_handshake_matching_is_maximum_per_signature_block():
    """The directed overlap graph is a disjoint union of complete
    bipartite blocks (one per (k-1)-mer signature), so the maximum
    matching size is sum_s min(#out_ports(s), #in_ports(s)); the
    handshake matching must reach exactly that (docs/DESIGN.md)."""
    from kmerset_tpu.core.graph import handshake_matching

    rng = np.random.default_rng(77)
    for _ in range(5):
        n_sig = int(rng.integers(1, 6))
        out_ports, in_ports = [], []
        edges_a, edges_b = [], []
        pid = 0
        expected = 0
        for s in range(n_sig):
            po = [pid + i for i in range(int(rng.integers(0, 5)))]
            pid += len(po)
            pi = [pid + i for i in range(int(rng.integers(0, 5)))]
            pid += len(pi)
            expected += min(len(po), len(pi))
            for a in po:
                for b in pi:
                    edges_a.append(a)
                    edges_b.append(b)
            out_ports += po
            in_ports += pi
        if not edges_a:
            continue
        order = rng.permutation(len(edges_a))
        pa = np.array(edges_a, dtype=np.int64)[order]
        pb = np.array(edges_b, dtype=np.int64)[order]
        match = handshake_matching(pa, pb, pid)
        assert int((match >= 0).sum()) // 2 == expected


def test_greedy_match_native_equals_handshake_rounds():
    """The one-pass native greedy scan equals the priority-ordered
    handshake fixpoint (the locally-minimal-edge equivalence,
    core/graph.py::handshake_matching)."""
    from kmerset_tpu.core import graph, native

    if native.get_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(13)
    for _ in range(10):
        n_ports = int(rng.integers(2, 300))
        n_e = int(rng.integers(0, 800))
        pa = rng.integers(0, n_ports, n_e).astype(np.int64)
        pb = rng.integers(0, n_ports, n_e).astype(np.int64)
        # Self-loops (a == b) included on purpose: both paths must agree
        # on them (native skips; handshake strips before its fixpoint).
        nm = native.greedy_match(pa, pb, n_ports)
        lib = native._LIB
        native._LIB = None
        try:
            hm = graph.handshake_matching(pa, pb, n_ports)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(nm, hm)


def _circular_read(L, k, seed):
    rng = np.random.default_rng(seed)
    s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
    return s + s[: k - 1]


@pytest.mark.parametrize("canonical", [False, True])
def test_all_cycle_input_native_matches_fallback(canonical):
    """Worst case for cycle emission: the whole graph is cycles (a
    circular genome).  The native one-pass walk must be byte-identical
    to the Python fallback and reconstruct exactly (VERDICT r1 #6;
    reference: lib/core/spss.h:583-612)."""
    from kmerset_tpu.core import native, spss
    from kmerset_tpu.core.kmer_counter import KmerCounter

    k = 9
    read = _circular_read(300, k, 5)
    counter = KmerCounter.from_reads(k, [read], canonical)
    ks, _ = counter.to_kmer_set(1)
    get = spss.get_unitigs_canonical if canonical else spss.get_unitigs

    un_native = get(ks)
    had_native = native.get_lib() is not None
    lib = native._LIB
    native._LIB = None
    try:
        un_py = get(ks)
    finally:
        native._LIB = lib
    if had_native:
        # Chain group order is allowed to differ between the native and
        # fallback walks; the string multiset must not.
        assert sorted(un_native.to_strings()) == sorted(un_py.to_strings())
    # Reconstruction invariant: decode == input set, every k-mer once.
    dec = spss.get_kmer_set_from_spss(un_native, k, canonical)
    assert dec.equals(ks)
    total_kmers = sum(
        max(0, int(l) - k + 1) for l in un_native.lengths()
    )
    assert total_kmers == ks.size()


@pytest.mark.parametrize("oriented", [False, True])
def test_walk_cycles_native_byte_parity(oriented):
    """native.walk_cycles must traverse and emit byte-identically to the
    Python fallback loop on the same successor graph (including the
    reverse-complement branch for oriented nodes)."""
    from kmerset_tpu.core import native
    from kmerset_tpu.core.spss import _walk_cycles

    if native.get_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(31)
    k = 9
    n = 64
    A = np.sort(
        rng.choice(1 << (2 * k), size=n, replace=False).astype(np.int64)
    )
    if oriented:
        perm = rng.permutation(n)
        perm2 = rng.permutation(n)
        succ = np.empty(2 * n, dtype=np.int64)
        succ[0::2] = 2 * perm + (np.arange(n) & 1)
        succ[1::2] = 2 * perm2 + ((np.arange(n) >> 1) & 1)
    else:
        succ = rng.permutation(n).astype(np.int64)
    # Mark a few entities visited up front: walks must stop there.
    visited0 = np.zeros(n, dtype=bool)
    visited0[rng.choice(n, 5, replace=False)] = True

    res = native.walk_cycles(succ, A, k, oriented, visited0.copy())
    assert res is not None
    codes_n, offsets_n = res

    lib = native._LIB
    native._LIB = None
    try:
        ps = _walk_cycles(A, k, succ, visited0.copy(), oriented)
    finally:
        native._LIB = lib
    np.testing.assert_array_equal(codes_n, ps.codes)
    np.testing.assert_array_equal(offsets_n, ps.offsets)


def test_seq_match_native_byte_parity():
    """native.seq_match must equal the Python _sequential_matching loop
    exactly (same path-extension order, same loop-avoidance rule)."""
    from kmerset_tpu.core import native
    from kmerset_tpu.core.spss import _sequential_matching

    if native.get_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(41)
    for _ in range(10):
        n = int(rng.integers(2, 200))
        n_e = int(rng.integers(0, 600))
        pa = rng.integers(0, 2 * n, n_e).astype(np.int64)
        pb = rng.integers(0, 2 * n, n_e).astype(np.int64)
        nm = native.seq_match(pa, pb, n)
        lib = native._LIB
        native._LIB = None
        try:
            pm = _sequential_matching(n, pa, pb)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(nm, pm)


def test_emit_string_chains_numpy_fallback_parity(monkeypatch):
    """The pure-numpy emission in _emit_string_chains must be
    byte-identical to the native path (the fallback runs wherever the C
    library is absent; found untested by the coverage report)."""
    import kmerset_tpu.core.native as nat
    from kmerset_tpu.core import spss as spss_mod
    from kmerset_tpu.utils.random import get_random_kmer_set

    if nat.get_lib() is None:
        pytest.skip("native lib not built (nothing to compare against)")
    rng = np.random.default_rng(321)
    for canonical in (True, False):
        ks = get_random_kmer_set(9, 4000, canonical, rng)
        want = (
            spss_mod.get_spss_canonical(ks, True)
            if canonical
            else spss_mod.get_spss(ks)
        ).to_strings()
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(nat, "emit_string_chains", lambda *a, **kw: None)
            got = (
                spss_mod.get_spss_canonical(ks, True)
                if canonical
                else spss_mod.get_spss(ks)
            ).to_strings()
        assert got == want


def test_emit_kmer_chains_empty_group_backend_parity(monkeypatch):
    """Empty chain groups must emit length-0 strings on every backend
    (the native binding documents this; the numpy fallback used to give
    an empty group k-1 garbage bytes and read the next group's first
    node — review finding, round 3)."""
    import kmerset_tpu.core.native as nat
    from kmerset_tpu.core.spss import _emit_kmer_chains

    k = 5
    A = np.sort(
        np.unique(np.random.default_rng(9).integers(0, 1 << (2 * k), 8))
    ).astype(np.int64)
    nodes = np.array([0, 4], dtype=np.int64)
    groups = np.array([0, 1, 1, 2], dtype=np.int64)  # middle group empty

    native_res = _emit_kmer_chains(A, k, nodes, groups, oriented=False)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(nat, "emit_kmer_chains", lambda *a, **kw: None)
        fallback_res = _emit_kmer_chains(A, k, nodes, groups, oriented=False)
    assert fallback_res.to_strings() == native_res.to_strings()
    assert fallback_res.lengths().tolist() == [k, 0, k]
