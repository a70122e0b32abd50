"""Range.split exhaustive test (reference: test/range.cc:5-19) and the
disjoint-set partition-equivalence oracle
(reference: test/parallel_disjoint_set.cc:39-180)."""

import numpy as np
import pytest

from kmerset_tpu.core.disjoint_set import DisjointSet, connected_components
from kmerset_tpu.utils.range import Range


def test_range_split_exhaustive():
    for begin in range(0, 30, 7):
        for end in range(begin, begin + 40, 9):
            for n in range(1, 12):
                parts = Range(begin, end).split(n)
                assert len(parts) == n
                # Contiguous cover.
                assert parts[0].begin == begin and parts[-1].end == end
                for a, b in zip(parts, parts[1:]):
                    assert a.end == b.begin
                # Balanced within 1.
                sizes = [len(p) for p in parts]
                assert max(sizes) - min(sizes) <= 1


def test_range_invalid():
    with pytest.raises(ValueError):
        Range(5, 3)


class _NaiveDS:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, i):
        while self.p[i] != i:
            i = self.p[i]
        return i

    def unite(self, i, j):
        self.p[self.find(i)] = self.find(j)


@pytest.mark.parametrize("seed", range(4))
def test_disjoint_set_oracle(seed):
    """Same-root relation must induce the same partition as a naive
    sequential implementation over the same unite sequence."""
    rng = np.random.default_rng(seed)
    n = 200
    ds = DisjointSet(n)
    naive = _NaiveDS(n)
    edges = rng.integers(0, n, size=(300, 2))
    for i, j in edges:
        ds.unite(int(i), int(j))
        naive.unite(int(i), int(j))
    for a in range(0, n, 7):
        for b in range(0, n, 11):
            assert ds.is_same(a, b) == (naive.find(a) == naive.find(b))


@pytest.mark.parametrize("seed", range(3))
def test_connected_components_matches_union_find(seed):
    rng = np.random.default_rng(10 + seed)
    n = 300
    a = rng.integers(0, n, size=250).astype(np.int64)
    b = rng.integers(0, n, size=250).astype(np.int64)
    labels = connected_components(n, a, b)
    ds = DisjointSet(n)
    ds.unite_edges(a, b)
    roots = ds.roots()
    # Same partition: label equality must match root equality.
    for x in range(0, n, 13):
        for y in range(0, n, 17):
            assert (labels[x] == labels[y]) == (roots[x] == roots[y])
    # Labels are the min member of each component.
    for x in range(n):
        members = np.flatnonzero(labels == labels[x])
        assert labels[x] == members.min()


def test_get_random_ints_properties():
    """GetRandomInts parity (reference: lib/core/random.h:13-41)."""
    import numpy as np

    from kmerset_tpu.utils.random import get_random_ints

    rng = np.random.default_rng(0)
    a = get_random_ints(50, True, True, 10, 99, rng)
    assert a.size == 50
    assert np.all((a >= 10) & (a <= 99))
    assert np.unique(a).size == 50
    assert np.all(np.diff(a) > 0)
    b = get_random_ints(200, False, False, 0, 3, rng)
    assert b.size == 200 and np.all((b >= 0) & (b <= 3))
