"""Native kmerio loader tests — parity against the pure-Python paths."""

import sys

import numpy as np
import pytest

from kmerset_tpu.core import io as core_io
from kmerset_tpu.core import native
from kmerset_tpu.core.kmer_counter import KmerCounter

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="libkmerio.so not built"
)


def test_parse_fasta_matches_python():
    text = ">a\nACGTNNACG\n>b\nTTT\n>c\nNNN\n"
    codes, offsets = native.parse_fasta_bytes(text.encode())
    reads = core_io.parse_fasta_lines(text.strip().split("\n"))
    pcodes, poffsets = core_io.reads_to_codes(reads)
    np.testing.assert_array_equal(codes, pcodes)
    np.testing.assert_array_equal(offsets, poffsets)


def test_parse_fasta_errors():
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b">a\nACGT\n>b\n")  # odd lines
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b"ACGT\nACGT\n")  # no header
    with pytest.raises(ValueError):
        native.parse_fasta_bytes(b">a\nACGX\n")  # bad char


def test_counter_native_path(tmp_path):
    path = tmp_path / "x.fasta"
    path.write_text(">a\nACGTACGT\n>b\nTTTTT\n")
    c = KmerCounter.from_fasta(5, str(path), "", canonical=False)
    c2 = KmerCounter.from_fasta_lines(
        5, [">a", "ACGTACGT", ">b", "TTTTT"], canonical=False
    )
    np.testing.assert_array_equal(c.kmers, c2.kmers)
    np.testing.assert_array_equal(c.counts, c2.counts)


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 3, 4, 5, 1000]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        packed = native.pack2(codes)
        assert packed.shape[0] == (n + 3) // 4
        np.testing.assert_array_equal(native.unpack2(packed, n), codes)



def test_native_revcomp_matches_numpy():
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import native

    rng = np.random.default_rng(0)
    for k in (9, 15, 23, 31):
        kmers = rng.integers(0, 1 << (2 * k), 1 << 17, dtype=np.int64)
        got = native.revcomp(kmers, k)
        # numpy shuffle path (force by using small slices under threshold)
        exp = np.concatenate(
            [kc.reverse_complement(c, k) for c in np.array_split(kmers, 8)]
        )
        np.testing.assert_array_equal(got, exp)



def test_native_window_pack_matches_numpy():
    from kmerset_tpu.core import native

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 1 << 17).astype(np.uint8)
    for k in (3, 15, 31):
        got = native.window_pack(codes, k)
        n = codes.shape[0] - k + 1
        exp = np.zeros(n, dtype=np.int64)
        c64 = codes.astype(np.int64)
        for j in range(k):
            exp = (exp << 2) | c64[j : j + n]
        np.testing.assert_array_equal(got, exp)



def test_native_chain_walk():
    from kmerset_tpu.core import native

    # chains: 0->1->2->-1, 3->-1, cycle 4->5->4
    succ = np.array([1, 2, -1, -1, 5, 4], dtype=np.int64)
    nodes, groups = native.chain_walk(succ, np.array([0, 3], dtype=np.int64))
    np.testing.assert_array_equal(nodes, [0, 1, 2, 3])
    np.testing.assert_array_equal(groups, [0, 3, 4])


@pytest.mark.parametrize("k", [9, 15, 19])
@pytest.mark.parametrize("canonical", [True, False])
def test_native_side_tables_match_numpy(k, canonical):
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import spss as S

    rng = np.random.default_rng(k + canonical)
    codes = rng.integers(0, 4, 5000).astype(np.int64)
    w = kc.kmers_from_codes(codes, k)
    if canonical:
        w = kc.canonical(w, k)
    A = np.unique(w)
    got = native.side_tables(A, k, canonical)
    assert got is not None
    if canonical:
        exp_r = S._side_table_canonical(A, k, right=True)
        exp_l = S._side_table_canonical(A, k, right=False)
    else:
        z = np.zeros(A.size, bool)
        exp_r = S._side_table_plain(A, k, right=True) + (z,)
        exp_l = S._side_table_plain(A, k, right=False) + (z,)
    for side, exp in ((got[0], exp_r), (got[1], exp_l)):
        np.testing.assert_array_equal(side[0], exp[0])
        m = exp[0] >= 1
        np.testing.assert_array_equal(side[1][m], exp[1][m])
        if canonical:
            np.testing.assert_array_equal(side[2][m], exp[2][m])


def test_native_overlap_edges_match_numpy():
    """The C hash-multimap edge discovery must reproduce the vectorized
    sorted join exactly, including discovery order (greedy priority)."""
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import spss as S
    from kmerset_tpu.core.kmer_set import KmerSet

    k = 9
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, 4000).astype(np.int64)
    A = np.unique(kc.canonical(kc.kmers_from_codes(codes, k), k))
    unitigs = S.get_unitigs_canonical(KmerSet(k, A, _sorted=True))
    P = unitigs.first_kmers(k)
    Sk = unitigs.last_kmers(k)
    n = len(unitigs)

    ca, cb = native.overlap_edges(P, Sk, k)
    ca, cb = S._dedup_port_edges(ca, cb, n)

    # numpy path (recompute via the internal joins by disabling native)
    import kmerset_tpu.core.native as nat

    lib = nat._LIB
    nat._LIB = None
    try:
        na, nb = S._candidate_port_edges_canonical(unitigs, k)
    finally:
        nat._LIB = lib

    # Exact order parity: the greedy matching priority (and therefore the
    # emitted SPSS strings) must not depend on whether the native lib is
    # present.
    np.testing.assert_array_equal(ca, na)
    np.testing.assert_array_equal(cb, nb)


@pytest.mark.parametrize("k", [9, 15, 19])
def test_overlap_edges_part_order_identical(monkeypatch, k):
    """The cache-blocked partitioned overlap probe must reproduce the fp
    edition's exact discovery order (the packed-hit sort restores
    pass-major rank order and ascending-j multimap order)."""
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import spss as S
    from kmerset_tpu.core.kmer_set import KmerSet

    lib = native.get_lib()
    if not getattr(lib, "_oe_part", False):
        # Binding state may predate the part probe: force a re-probe.
        if hasattr(lib, "_oe_ready"):
            del lib._oe_ready
    rng = np.random.default_rng(50 + k)
    codes = rng.integers(0, 4, 60_000).astype(np.int64)
    A = np.unique(kc.canonical(kc.kmers_from_codes(codes, k), k))
    unitigs = S.get_unitigs_canonical(KmerSet(k, A, _sorted=True))
    P = unitigs.first_kmers(k)
    Sk = unitigs.last_kmers(k)

    fa, fb = native.overlap_edges(P, Sk, k)  # fp edition (below min)
    monkeypatch.setattr(native, "_OVERLAP_PART_MIN", 1)
    if not getattr(native.get_lib(), "_oe_part", False):
        pytest.skip("partitioned edition not in this build")
    pa, pb = native.overlap_edges(P, Sk, k)
    np.testing.assert_array_equal(pa, fa)
    np.testing.assert_array_equal(pb, fb)


def test_native_sorted_algebra():
    rng = np.random.default_rng(4)
    for na, nb in [(0, 5), (5, 0), (0, 0), (500, 700), (1, 1)]:
        a = np.unique(rng.integers(0, 1000, na)).astype(np.int64)
        b = np.unique(rng.integers(0, 1000, nb)).astype(np.int64)
        res = native.sorted_algebra(a, b)
        assert res is not None
        inter, a_only, b_only = res
        np.testing.assert_array_equal(inter, np.intersect1d(a, b))
        np.testing.assert_array_equal(a_only, np.setdiff1d(a, b))
        np.testing.assert_array_equal(b_only, np.setdiff1d(b, a))


def test_pool_allocator_roundtrip():
    """The NEP-49 pooling allocator (native/pool_alloc.c, reference
    mimalloc-parity, CMakeLists.txt:36-38) recycles large blocks and
    zeroes recycled calloc pages."""
    import kmerset_tpu  # noqa: F401 - triggers install

    pool = sys.modules.get("kmerset_pool")
    if pool is None:
        pytest.skip("pool allocator extension not built")
    before = pool.stats()
    a = np.ones(1 << 19, dtype=np.int64)  # 4MB: pooled size class
    checksum = int(a.sum())
    del a
    b = np.zeros(1 << 19, dtype=np.int64)  # recycled block must be zeroed
    assert int(b.sum()) == 0
    assert checksum == 1 << 19
    after = pool.stats()
    assert after["pool_hits"] + after["pool_misses"] > before["pool_hits"] + before["pool_misses"]
    # realloc both growth directions through np.resize
    c = np.resize(np.arange(1 << 18, dtype=np.int64), 1 << 20)
    assert int(c[123]) == 123
    d = np.resize(c, 16)
    assert int(d[15]) == 15


def test_pool_allocator_thread_safety():
    """Concurrent large alloc/free across threads while stats() runs
    (native/pool_alloc.c mutex + GC-reentrancy contract)."""
    import threading

    import kmerset_tpu  # noqa: F401

    pool = sys.modules.get("kmerset_pool")
    if pool is None:
        pytest.skip("pool allocator extension not built")
    stop = threading.Event()
    errors = []

    def churn():
        try:
            for i in range(50):
                a = np.ones((1 << 18) + i * 128, dtype=np.int64)
                assert a[0] == 1
                del a
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def poll_stats():
        while not stop.is_set():
            pool.stats()

    threads = [threading.Thread(target=churn) for _ in range(4)]
    poller = threading.Thread(target=poll_stats)
    poller.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    poller.join()
    assert not errors


def test_overlap_edges_overflow_fallback():
    """Degenerate same-signature inputs exceed the single-pass capacity
    (edge counts are quadratic per signature class); the two-pass
    count+fill path must kick in and return the full edge set."""
    if native.get_lib() is None:
        pytest.skip("native lib not built")
    n = 64
    S = np.full(n, 5, dtype=np.int64)
    P = np.full(n, (5 << 2) | 2, dtype=np.int64)  # next(S, c=2) == P
    res = native.overlap_edges(P, S, 9)
    assert res is not None
    pa, pb = res
    assert pa.shape[0] == 2 * n * (n - 1)  # both join families, no self
    assert pa.shape[0] > 8 * n


def test_set_threads_binds():
    from kmerset_tpu.core import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib not built")
    assert native.set_threads(2)
    assert native.set_threads(1)


def test_native_abi_version_matches_binding():
    """The Python binding hard-refuses a lib whose kmerio_abi_version
    differs from its expected value; this pins the current pair so a C
    signature change without a bump (or vice versa) fails loudly."""
    import ctypes

    lib = native.get_lib()
    lib.kmerio_abi_version.restype = ctypes.c_long
    assert lib.kmerio_abi_version() == 3


def test_native_chain_walk_refuses_cycles():
    """kmerio_chain_walk returns the violation code (binding: None) when
    succ reaches a cycle from a start or revisits nodes, instead of
    overrunning the n-sized output; _chains_grouped then still answers
    via the pointer-doubling fallback."""
    from kmerset_tpu.core import spss as S

    # start 0 leads into the 1<->2 cycle: not a chain.
    succ = np.array([1, 2, 1], dtype=np.int64)
    assert native.chain_walk(succ, np.array([0], np.int64)) is None
    # two starts converge on node 2: total emitted would exceed n.
    succ2 = np.array([2, 2, -1], dtype=np.int64)
    res = native.chain_walk(succ2, np.array([0, 1], np.int64))
    assert res is None
    # the public grouping still resolves the valid-chain portion of a
    # mixed graph through the fallback (cycle 3<->4 untouched, chains ok).
    succ3 = np.array([1, 2, -1, 4, 3], dtype=np.int64)
    nodes, groups = S._chains_grouped(succ3, np.array([0], np.int64))
    np.testing.assert_array_equal(nodes, [0, 1, 2])
    np.testing.assert_array_equal(groups, [0, 3])


def test_pool_calloc_zeroes_fresh_and_recycled():
    """hook_calloc skips the memset only for brand-new anonymous mmaps
    (kernel-zeroed); recycled pool blocks are dirty and must be zeroed.
    Exercise both orders: fresh np.zeros, then dirty-then-reuse."""
    pool = sys.modules.get("kmerset_pool")
    if pool is None:
        pytest.skip("pool allocator extension not built")
    n = 1 << 21  # 16MB of int64: pooled size class, likely-fresh mmap
    a = np.zeros(n, dtype=np.int64)
    assert not a.any()
    a += 1  # dirty every page
    del a
    b = np.zeros(n, dtype=np.int64)  # recycled block: memset path
    assert not b.any()
    del b


def test_ensure_built_builds_missing_and_stale(tmp_path, monkeypatch):
    """The on-demand native build (kmerset_tpu/_nativebuild.py): a missing
    target is built, an up-to-date target is left alone, a stale target
    (source newer than .so) is rebuilt, and KMERSET_TPU_NO_AUTOBUILD
    suppresses the whole mechanism.  Uses a toy Makefile so the test is
    hermetic and fast."""
    import os
    import time

    from kmerset_tpu import _nativebuild as nb

    monkeypatch.delenv("KMERSET_TPU_NO_AUTOBUILD", raising=False)
    ndir = tmp_path / "native"
    ndir.mkdir()
    (ndir / "Makefile").write_text(
        "out.txt: src.c\n\tcp src.c out.txt\n"
    )
    (ndir / "src.c").write_text("v1")
    monkeypatch.setattr(nb, "_native_dir", lambda: str(ndir))

    # missing -> built
    monkeypatch.setattr(nb, "_ATTEMPTED", set())
    nb.ensure_built("out.txt", ["src.c"])
    assert (ndir / "out.txt").read_text() == "v1"

    # fresh -> untouched (mtime preserved)
    t0 = os.path.getmtime(ndir / "out.txt")
    monkeypatch.setattr(nb, "_ATTEMPTED", set())
    nb.ensure_built("out.txt", ["src.c"])
    assert os.path.getmtime(ndir / "out.txt") == t0

    # stale -> rebuilt
    time.sleep(0.01)
    (ndir / "src.c").write_text("v2")
    os.utime(ndir / "src.c", (time.time() + 1, time.time() + 1))
    monkeypatch.setattr(nb, "_ATTEMPTED", set())
    nb.ensure_built("out.txt", ["src.c"])
    assert (ndir / "out.txt").read_text() == "v2"

    # suppressed by env var
    (ndir / "src.c").write_text("v3")
    os.utime(ndir / "src.c", (time.time() + 2, time.time() + 2))
    monkeypatch.setattr(nb, "_ATTEMPTED", set())
    monkeypatch.setenv("KMERSET_TPU_NO_AUTOBUILD", "1")
    nb.ensure_built("out.txt", ["src.c"])
    assert (ndir / "out.txt").read_text() == "v2"


def test_chain_walk_kept_refuses_cycle_reachable_start():
    """Pass 1 of the mirror-dedup walk must refuse (not silently drop) a
    start that leads into a cycle — dropping it would lose its k-mers
    from the SPSS with no error."""
    succ = np.array([1, 2, 1, -1], dtype=np.int64)  # 0 -> 1 <-> 2 cycle
    res = native.chain_walk_kept(
        succ, np.array([0], np.int64), lambda s, e: np.ones(s.shape, bool)
    )
    assert res is None


def test_chain_walk_kept_refuses_asymmetric_mirror():
    """Pass 2 is bounded by the measured lengths: when the keep rule
    selects the mirror start but the graph is not mirror-symmetric (the
    mirror chain is LONGER than measured), the emit must refuse before
    overrunning its group slot."""
    # chain 0 -> 2 (len 2); 'mirror' start 3 walks 3 -> 1 -> 5 (len 3).
    succ = np.array([2, 5, -1, 1, -1, -1], dtype=np.int64)
    res = native.chain_walk_kept(
        succ, np.array([0], np.int64), lambda s, e: np.zeros(s.shape, bool)
    )
    assert res is None


def test_emit_kmer_chains_empty_group_exact_length():
    """The returned codes end exactly at offsets[-1]: an empty group must
    not inflate the slice with (k-1) uninitialized tail bytes."""
    A = np.array([5, 9, 12], dtype=np.int64)
    nodes = np.array([0, 1], dtype=np.int64)
    groups = np.array([0, 2, 2], dtype=np.int64)  # second group empty
    res = native.emit_kmer_chains(A, 3, nodes, groups, False)
    assert res is not None
    codes, offsets = res
    assert offsets[-1] == codes.shape[0]
    assert codes.shape[0] == 3 + 1  # k codes for the head + 1 per step


@pytest.mark.parametrize("k", [9, 15, 19, 23, 31])
def test_native_side_tables_part_matches_fp(k):
    """The cache-blocked partitioned edition must be bit-identical to the
    fp edition on every key layout (narrow fp32-exact keys at k <= 16,
    verified wide keys above), including deg counts, first-neighbor
    choice across the c order, and same-side flags."""
    from kmerset_tpu.core import kmer as kc

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    native.side_tables(np.array([5], dtype=np.int64), k, True)  # bind syms
    if not getattr(lib, "_st_part", False):
        pytest.skip("partitioned edition not in this lib build")
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 60_000).astype(np.int64)
    A = np.unique(kc.canonical(kc.kmers_from_codes(codes, k), k))
    fp = native.side_tables(A, k, True, impl="fp")
    pt = native.side_tables(A, k, True, impl="part")
    assert fp is not None and pt is not None
    for s_fp, s_pt in zip(fp, pt):
        for a, b in zip(s_fp, s_pt):
            np.testing.assert_array_equal(a, b)


def test_native_side_tables_part_grow_only_scratch():
    """Repeated partitioned calls with shrinking inputs reuse one
    process-level scratch buffer (no reallocation churn)."""
    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.core import native as nat

    lib = nat.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    nat.side_tables(np.array([5], dtype=np.int64), 15, True)  # bind syms
    if not getattr(lib, "_st_part", False):
        pytest.skip("partitioned edition not in this lib build")
    rng = np.random.default_rng(0)
    big = np.unique(kc.canonical(
        kc.kmers_from_codes(rng.integers(0, 4, 80_000).astype(np.int64), 15), 15))
    small = big[: big.size // 4]
    r1 = nat.side_tables(big, 15, True, impl="part")
    buf = nat._part_scratch
    assert buf is not None
    r2 = nat.side_tables(small, 15, True, impl="part")
    assert nat._part_scratch is buf  # reused, not reallocated
    assert r1 is not None and r2 is not None


def test_dedup_edges_matches_numpy_unique():
    """kmerio_dedup_edges (one hash pass, discovery order) must equal
    the numpy unique-with-first-index dedup it replaces
    (core/spss._dedup_port_edges fallback) on randomized edge lists."""
    from kmerset_tpu.core import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for trial in range(30):
        m = int(rng.integers(0, 2000))
        n = int(rng.integers(2, 500))
        a = rng.integers(0, 2 * n, m).astype(np.int64)
        b = rng.integers(0, 2 * n, m).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        idx = native.dedup_edges(a, b)
        assert idx is not None
        key = np.minimum(a, b) * (2 * n) + np.maximum(a, b)
        _, first_idx = np.unique(key, return_index=True)
        first_idx.sort()
        assert np.array_equal(idx, first_idx), trial
    # Oversized ports refuse the 32|32 key packing (numpy fallback).
    wide = np.array([1 << 33, 5], dtype=np.int64)
    assert native.dedup_edges(wide, np.array([5, 7], dtype=np.int64)) is None
