"""Sort-join lookup and device side-table tests (vs host reference)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from kmerset_tpu.core import spss  # noqa: E402
from kmerset_tpu.ops.join import intersection_count, lookup_join  # noqa: E402
from kmerset_tpu.ops.neighbors import device_side_tables  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("dtype", [np.int32, np.int64])
def test_lookup_join_matches_searchsorted(seed, dtype):
    rng = np.random.default_rng(seed)
    A = np.unique(rng.integers(0, 1 << 20, 500)).astype(dtype)
    Q = rng.integers(0, 1 << 20, 1024).astype(dtype)
    found, idx = lookup_join(A, Q, n_groups=2)
    found = np.asarray(found).reshape(-1)
    idx = np.asarray(idx).reshape(-1)
    pos = np.searchsorted(A, Q)
    posc = np.minimum(pos, A.shape[0] - 1)
    exp_found = A[posc] == Q
    np.testing.assert_array_equal(found, exp_found)
    np.testing.assert_array_equal(idx[exp_found], posc[exp_found])


def test_lookup_join_with_sentinel_padding():
    A = np.array([3, 7, 9, 1 << 62, 1 << 62], dtype=np.int64)
    Q = np.array([7, 8, 3, 9], dtype=np.int64)
    found, idx = lookup_join(A, Q)
    np.testing.assert_array_equal(np.asarray(found)[0], [True, False, True, True])
    np.testing.assert_array_equal(np.asarray(idx)[0][[0, 2, 3]], [1, 0, 2])


@pytest.mark.parametrize("seed", [0, 5])
def test_intersection_count(seed):
    rng = np.random.default_rng(seed)
    A = np.unique(rng.integers(0, 3000, 800)).astype(np.int64)
    B = np.unique(rng.integers(0, 3000, 800)).astype(np.int64)
    assert int(intersection_count(A, B)) == np.intersect1d(A, B).size


@pytest.mark.parametrize("k", [9, 15, 19, 23])
@pytest.mark.parametrize("canonical", [True, False])
def test_device_side_tables_match_host(k, canonical):
    from kmerset_tpu.core import kmer as kc

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 4000).astype(np.int64)
    w = kc.kmers_from_codes(codes, k)
    if canonical:
        w = kc.canonical(w, k)
    A = np.unique(w)
    dev = device_side_tables(A, k, canonical)
    assert dev is not None
    (rdeg, rnbr, rsame), (ldeg, lnbr, lsame) = dev
    if canonical:
        hr = spss._side_table_canonical(A, k, right=True)
        hl = spss._side_table_canonical(A, k, right=False)
    else:
        hr = spss._side_table_plain(A, k, right=True) + (np.zeros(A.size, bool),)
        hl = spss._side_table_plain(A, k, right=False) + (np.zeros(A.size, bool),)
    np.testing.assert_array_equal(rdeg, hr[0])
    np.testing.assert_array_equal(ldeg, hl[0])
    # nbr/same only meaningful where an edge exists and deg-order agrees on
    # the unique first neighbor when deg == 1.
    m = hr[0] == 1
    np.testing.assert_array_equal(rnbr[m], hr[1][m])
    ml = hl[0] == 1
    np.testing.assert_array_equal(lnbr[ml], hl[1][ml])
    if canonical:
        np.testing.assert_array_equal(rsame[m], hr[2][m])
        np.testing.assert_array_equal(lsame[ml], hl[2][ml])


@pytest.mark.parametrize("k", [7, 15])
def test_pallas_pack_interpret_matches_host(k):
    """The Mosaic pack kernel, run under the Pallas interpreter, must agree
    with the host codec on every valid window."""
    from jax.experimental.pallas import tpu as pltpu

    from kmerset_tpu.core import kmer as kc
    from kmerset_tpu.ops.pallas_pack import canonical_windows_pallas

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 5000).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(canonical_windows_pallas(codes, k))
    w = kc.kmers_from_codes(codes.astype(np.int64), k)
    exp = kc.canonical(w, k)
    np.testing.assert_array_equal(got[: exp.shape[0]], exp)


@pytest.mark.parametrize("k", [9, 15, 19, 23])
def test_device_unitig_succ_matches_host(k, monkeypatch):
    """The fused device successor front-end must reproduce the host
    terminal/successor construction, and the full unitig build must be
    set-identical either way."""
    from kmerset_tpu.core.kmer_set import KmerSet
    from kmerset_tpu.ops.unitigs import device_unitig_succ

    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 6000).astype(np.int64)
    from kmerset_tpu.core import kmer as kc

    A = np.unique(kc.canonical(kc.kmers_from_codes(codes, k), k))
    dev = device_unitig_succ(A, k)
    assert dev is not None
    succ_d, term_l_d, term_r_d, both_d = dev

    (rdeg, rnbr, rsame), (ldeg, lnbr, lsame) = spss._side_tables(A, k, True)
    mate_r = np.where(rsame, rdeg[rnbr], ldeg[rnbr])
    term_r = (rdeg != 1) | (mate_r != 1)
    mate_l = np.where(lsame, ldeg[lnbr], rdeg[lnbr])
    term_l = (ldeg != 1) | (mate_l != 1)
    succ = np.empty(2 * A.size, dtype=np.int64)
    succ[0::2] = np.where(term_r, -1, 2 * rnbr + rsame)
    succ[1::2] = np.where(term_l, -1, 2 * lnbr + (~lsame).astype(np.int64))

    np.testing.assert_array_equal(term_r_d, term_r)
    np.testing.assert_array_equal(term_l_d, term_l)
    np.testing.assert_array_equal(both_d, term_l & term_r)
    np.testing.assert_array_equal(succ_d, succ)

    # End-to-end: unitig sets identical whichever front-end ran.
    ks = KmerSet(k, A, _sorted=True)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    u_dev = spss.get_unitigs_canonical(ks)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    u_host = spss.get_unitigs_canonical(ks)
    rt_d = spss.get_kmer_set_from_spss(u_dev, k, True)
    rt_h = spss.get_kmer_set_from_spss(u_host, k, True)
    np.testing.assert_array_equal(rt_d.kmers, rt_h.kmers)
    np.testing.assert_array_equal(rt_d.kmers, A)


@pytest.mark.parametrize("frac", [0.0, 0.05, 0.5, 1.0])
def test_pallas_compact_interpret_matches_host(frac):
    """The Pallas stream compactor (interpret mode) equals boolean-mask
    compaction (kernel design: ops/pallas_compact.py)."""
    import jax.numpy as jnp

    from kmerset_tpu.ops.pallas_compact import BLOCK, compact_select_i32

    rng = np.random.default_rng(int(frac * 100) + 3)
    n = 2 * BLOCK
    keys = np.sort(rng.integers(0, 1 << 30, n).astype(np.int32))
    keys = np.unique(keys)
    keys = np.pad(keys, (0, n - keys.size), constant_values=(1 << 31) - 1)
    keep = rng.random(n) <= frac if frac else np.zeros(n, bool)
    keep &= keys < (1 << 30)
    # kept values must be strictly increasing (run heads are)
    keep[1:] &= keys[1:] != keys[:-1]
    got, n_sel = compact_select_i32(jnp.array(keys), jnp.array(keep), interpret=True)
    ns = int(n_sel)
    expect = keys[keep]
    assert ns == expect.size
    assert np.array_equal(np.asarray(got[:ns]), expect)


def test_pallas_compact_pair_interpret_counts():
    """Pair-lane compaction recovers run lengths as position diffs
    (count_kmers kernel path, ops/count.py)."""
    import jax.numpy as jnp

    from kmerset_tpu.ops.pallas_compact import BLOCK, compact_select_pair_i32

    rng = np.random.default_rng(11)
    n = 2 * BLOCK
    # sorted keys with duplicates + sentinel tail
    vals = np.sort(rng.integers(0, n // 3, n - 77).astype(np.int32))
    keys = np.pad(vals, (0, 77), constant_values=(1 << 31) - 1)
    live = keys < (1 << 31) - 1
    boundary = live & np.concatenate([[True], keys[1:] != keys[:-1]])
    pos = np.arange(n, dtype=np.int32)
    ck, cp, n_sel = compact_select_pair_i32(
        jnp.array(keys), jnp.array(pos), jnp.array(boundary), interpret=True
    )
    ns = int(n_sel)
    u, idx, cts = np.unique(vals, return_index=True, return_counts=True)
    assert ns == u.size
    assert np.array_equal(np.asarray(ck[:ns]), u)
    assert np.array_equal(np.asarray(cp[:ns]), idx.astype(np.int32))
    got_counts = np.diff(np.append(np.asarray(cp[:ns]), vals.size))
    assert np.array_equal(got_counts, cts)


def test_pallas_compact_two_key_interpret():
    """Pair key layout (k in 16..23): hi/lo int32 lanes with num_keys=2
    partition (count paths for k=19/23, ops/count.py)."""
    import jax.numpy as jnp

    from kmerset_tpu.ops.pallas_compact import BLOCK, compact_select_multi

    rng = np.random.default_rng(5)
    n = 2 * BLOCK
    pairs = np.unique(
        rng.integers(0, 1 << 24, (n, 2)).astype(np.int32), axis=0
    )
    pairs = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
    m = pairs.shape[0]
    hi = np.full(n, 1 << 30, np.int32)
    lo = np.zeros(n, np.int32)
    hi[:m], lo[:m] = pairs[:, 0], pairs[:, 1]
    keep = rng.random(n) < 0.4
    keep &= hi < (1 << 30)
    lanes, n_sel = compact_select_multi(
        [jnp.array(hi), jnp.array(lo)], jnp.array(keep), num_keys=2, interpret=True
    )
    ns = int(n_sel)
    assert ns == int(keep.sum())
    assert np.array_equal(np.asarray(lanes[0][:ns]), hi[keep])
    assert np.array_equal(np.asarray(lanes[1][:ns]), lo[keep])


def test_lookup_join32_matches_int64():
    """The fused-tag int32 join (ops/join.py lookup_join32) agrees with
    the generic path, including keys adjacent to the PAD32 sentinel."""
    import jax.numpy as jnp

    from kmerset_tpu.ops.join import lookup_join, lookup_join32

    rng = np.random.default_rng(9)
    A = np.unique(rng.integers(0, (1 << 30) - 1, 4096)).astype(np.int32)
    A = np.unique(np.concatenate([A, np.int32([(1 << 30) - 2, 0])]))
    Q = np.concatenate(
        [
            rng.integers(0, (1 << 30) - 1, 8192).astype(np.int32),
            A[rng.integers(0, A.shape[0], 512)],  # guaranteed hits
        ]
    )
    f64, i64 = lookup_join(jnp.asarray(A.astype(np.int64)), jnp.asarray(Q.astype(np.int64)), n_groups=1)
    f32, i32 = lookup_join32(jnp.asarray(A), jnp.asarray(Q), n_groups=1)
    np.testing.assert_array_equal(np.asarray(f64), np.asarray(f32))
    np.testing.assert_array_equal(
        np.asarray(i64)[np.asarray(f64)], np.asarray(i32)[np.asarray(f32)]
    )


def test_compact_block_env_malformed_and_nondivisible(monkeypatch, caplog):
    """KMERSET_TPU_COMPACT_BLOCK must warn-and-default on malformed or
    non-power-of-two values — a raise here would be swallowed into a
    silent host fallback by every consumer, and a non-power-of-two
    block never divides any good_sort_size output (review finding)."""
    from kmerset_tpu.ops.pallas_compact import _block_size

    for bad in ("8k", "5120", "1024", "12288"):
        monkeypatch.setenv("KMERSET_TPU_COMPACT_BLOCK", bad)
        with caplog.at_level("WARNING", logger="kmerset"):
            caplog.clear()
            assert _block_size() == 8192
        assert any("KMERSET_TPU_COMPACT_BLOCK" in r.message for r in caplog.records)
    monkeypatch.setenv("KMERSET_TPU_COMPACT_BLOCK", "16384")
    assert _block_size() == 16384
    monkeypatch.delenv("KMERSET_TPU_COMPACT_BLOCK")
    assert _block_size() == 8192
