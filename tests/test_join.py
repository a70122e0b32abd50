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
    A = np.array([3, 7, 9, (1 << 62) - 1, (1 << 62) - 1], dtype=np.int64)
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


@pytest.mark.parametrize("k", [9, 15, 19])
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
