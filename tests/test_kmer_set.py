"""KmerSet algebra tests (reference: test/kmer_set.cc:72-94)."""

import numpy as np

from kmerset_tpu.core import kmer as kc
from kmerset_tpu.core.config import get_config
from kmerset_tpu.core.kmer_set import KmerSet, intersection_size


def _set_from_strings(strings):
    k = len(strings[0])
    return KmerSet(k, np.array([kc.string_to_kmer(s) for s in strings]))


def test_basic():
    s = _set_from_strings(["AAA", "ACG", "TTT"])
    assert s.size() == 3
    assert s.contains_one(kc.string_to_kmer("ACG"))
    assert not s.contains_one(kc.string_to_kmer("GGG"))
    s2 = s.add_kmers(np.array([kc.string_to_kmer("GGG")]))
    assert s2.size() == 4
    s3 = s2.remove_kmers(np.array([kc.string_to_kmer("AAA")]))
    assert s3.size() == 3 and not s3.contains_one(kc.string_to_kmer("AAA"))


def test_algebra():
    a = _set_from_strings(["AAA", "ACG", "TTT"])
    b = _set_from_strings(["ACG", "GGG"])
    assert a.union(b).size() == 4
    assert a.subtract(b).size() == 2
    assert a.intersection(b).size() == 1
    assert a.diff_count(b) == 3
    assert a.equals(a) and not a.equals(b)


def test_hash_order_independent():
    rng = np.random.default_rng(0)
    kmers = np.unique(rng.integers(0, 1 << 18, size=500, dtype=np.int64))
    a = KmerSet(9, kmers)
    b = KmerSet(9, kmers[::-1].copy())
    assert a.hash() == b.hash()
    c = a.remove_kmers(kmers[:1])
    assert a.hash() != c.hash() or a.size() == c.size()


def test_bucket_slices_and_sampling():
    rng = np.random.default_rng(1)
    cfg = get_config(9, 10)
    kmers = np.unique(rng.integers(0, 1 << 18, size=2000, dtype=np.int64))
    s = KmerSet(9, kmers)
    starts = s.bucket_slices(cfg)
    assert starts[0] == 0 and starts[-1] == s.size()
    # Every kmer in bucket b has high bits == b.
    for b in [0, 5, 1000]:
        part = s.kmers[starts[b] : starts[b + 1]]
        if part.size:
            np.testing.assert_array_equal(part >> cfg.key_bits, b)
    sample = s.sample_buckets(cfg, np.array([3, 7]))
    expected = kmers[np.isin(kmers >> cfg.key_bits, [3, 7])]
    np.testing.assert_array_equal(sample, expected)


def test_intersection_size():
    a = np.array([1, 3, 5, 7], dtype=np.int64)
    b = np.array([3, 4, 5, 9], dtype=np.int64)
    assert intersection_size(a, b) == 2
    assert intersection_size(a, np.empty(0, np.int64)) == 0
