"""KmerSetSet tests (reference: test/kmer_set_set.cc:15-123)."""

import numpy as np
import pytest

from kmerset_tpu.core import kmer as kc
from kmerset_tpu.core.config import get_config
from kmerset_tpu.core.kmer_set import KmerSet
from kmerset_tpu.core.kmer_set_compact import KmerSetCompact
from kmerset_tpu.core.kmer_set_set import (
    KmerSetSet,
    KmerSetSetReader,
    deserialize_adjacency_list,
    serialize_adjacency_list,
)
from kmerset_tpu.utils.random import get_random_kmer_set, get_random_read

K = 9
CFG = get_config(K, 10)


def _related_sets(n_sets, rng):
    """Sets sharing a common core so the compressor has intersections to
    factor (the reference's random sets are unrelated; these are a harder
    and more realistic test of the greedy loop)."""
    core = get_random_kmer_set(K, 2000, True, rng)
    sets = []
    for _ in range(n_sets):
        extra = get_random_kmer_set(K, 500, True, rng)
        sets.append(core.union(extra))
    return sets


def test_adjacency_list_round_trip():
    adj = {0: [3, 4], 1: [4], 7: []}
    s = serialize_adjacency_list(adj)
    assert deserialize_adjacency_list(s) == adj
    # Format check: digits and spaces only (reference: kmer_set_set.h:43-45).
    assert set(s) <= set("0123456789 ")


@pytest.mark.parametrize("seed", [0, 1])
def test_compress_get_round_trip(seed):
    rng = np.random.default_rng(seed)
    originals = _related_sets(4, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    kss = KmerSetSet(compacts, True, CFG, seed=42)
    assert kss.size() >= 4
    for i, orig in enumerate(originals):
        assert kss.get(i, True).equals(orig), f"set {i} mismatch"


def test_compression_reduces_weight():
    rng = np.random.default_rng(5)
    originals = _related_sets(4, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    before = sum(c.weight() for c in compacts)
    kss = KmerSetSet([KmerSetCompact(K, c.spss) for c in compacts], True, CFG, seed=1)
    after = sum(c.weight() for c in kss.kmer_sets_compact_)
    # Shared cores factored out once instead of stored 4 times.
    assert after < before


def test_dump_load_reader(tmp_path):
    rng = np.random.default_rng(7)
    originals = _related_sets(3, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    kss = KmerSetSet(compacts, True, CFG, seed=3)

    d = str(tmp_path / "out")
    kss.dump(d, "", "txt")

    loaded = KmerSetSet.load(CFG, d, "", "txt", True)
    for i, orig in enumerate(originals):
        assert loaded.get(i, True).equals(orig)
    # Parallel load (reference's one-task-per-file pool): same sets.
    loaded_p = KmerSetSet.load(CFG, d, "", "txt", True, workers=4)
    for i, orig in enumerate(originals):
        assert loaded_p.get(i, True).equals(orig)

    reader = KmerSetSetReader.from_directory(CFG, d, "txt", "", True)
    assert reader.size() == kss.size()
    for i, orig in enumerate(originals):
        assert reader.get(i).equals(orig)


def test_compress_workers_byte_identical(tmp_path):
    """KmerSetSet(workers=4) — parallel weight-sweep builds — produces
    the identical DAG and byte-identical dump to the serial loop."""
    rng = np.random.default_rng(33)
    originals = _related_sets(4, rng)

    def build(workers):
        compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
        return KmerSetSet(compacts, True, CFG, seed=5, workers=workers)

    a, b = build(1), build(4)
    assert a.children_ == b.children_
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w4")
    a.dump(d1, "", "txt")
    b.dump(d2, "", "txt")
    import os

    for name in sorted(os.listdir(d1)):
        assert (
            open(os.path.join(d1, name), "rb").read()
            == open(os.path.join(d2, name), "rb").read()
        ), name


def test_dump_parallel_workers_byte_identical(tmp_path):
    """dump(workers=4) writes byte-identical files to the sequential
    dump (reference's one-task-per-file pool, kmer_set_set.h:494-528)."""
    rng = np.random.default_rng(21)
    originals = _related_sets(4, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    kss = KmerSetSet(compacts, True, CFG, seed=3)

    d_seq = str(tmp_path / "seq")
    d_par = str(tmp_path / "par")
    kss.dump(d_seq, "", "txt")
    kss.dump(d_par, "", "txt", workers=4)
    import os

    names = sorted(os.listdir(d_seq))
    assert names == sorted(os.listdir(d_par))
    for name in names:
        a = open(os.path.join(d_seq, name), "rb").read()
        b = open(os.path.join(d_par, name), "rb").read()
        assert a == b, name


def test_subset_input_empty_residual_roundtrip(tmp_path):
    """An input that is a strict subset of another factors to an EMPTY
    residual; empty compact sets must dump/load/decompress cleanly
    through the directory format and get_all."""
    rng = np.random.default_rng(55)
    big = _related_sets(1, rng)[0]
    sub_kmers = big.kmers[: big.size() // 2]
    sub = KmerSet(K, sub_kmers, _sorted=True)
    compacts = [
        KmerSetCompact.from_kmer_set(big, True),
        KmerSetCompact.from_kmer_set(sub, True),
    ]
    kss = KmerSetSet(compacts, True, CFG, seed=9)
    # The point of the fixture: factoring must actually have produced an
    # empty residual (sub was a strict subset) — otherwise this test
    # decays into a plain round-trip.
    assert any(c.size() == 0 for c in kss.kmer_sets_compact_)
    d = str(tmp_path / "out")
    kss.dump(d, "", "txt")
    reader = KmerSetSetReader.from_directory(CFG, d, "txt", "", True)
    for i, got in reader.get_all():
        assert got.equals(reader.get(i))
    assert reader.get(0).equals(big)
    assert reader.get(1).equals(sub)


def test_reader_get_all_matches_get(tmp_path):
    """get_all (one decode per shared child across the sweep) yields
    exactly the sets get(i) returns, in order."""
    rng = np.random.default_rng(27)
    originals = _related_sets(4, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    kss = KmerSetSet(compacts, True, CFG, seed=3)
    d = str(tmp_path / "out")
    kss.dump(d, "", "txt")
    reader = KmerSetSetReader.from_directory(CFG, d, "txt", "", True)
    seen = 0
    for i, got in reader.get_all(workers=2):
        assert got.equals(reader.get(i))
        if i < len(originals):  # user-visible sets; the rest are children
            assert got.equals(originals[i])
        seen += 1
    assert seen == reader.size()


def test_dump_graph(tmp_path):
    rng = np.random.default_rng(9)
    originals = _related_sets(3, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
    kss = KmerSetSet(compacts, True, CFG, seed=3)
    path = str(tmp_path / "g.dot")
    kss.dump_graph(path)
    lines = open(path).read().splitlines()
    assert lines[0] == "digraph G {" and lines[-1] == "}"
    assert all("->" in line for line in lines[1:-1])


def test_deterministic():
    rng = np.random.default_rng(11)
    originals = _related_sets(3, rng)

    def run():
        compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]
        return KmerSetSet(compacts, True, CFG, seed=5)

    a, b = run(), run()
    assert a.children_ == b.children_
    assert [c.weight() for c in a.kmer_sets_compact_] == [
        c.weight() for c in b.kmer_sets_compact_
    ]


def test_device_weight_oracle_matches_host(monkeypatch):
    """The device sketch table must produce the same compression DAG as
    the host sorted-merge path."""
    from kmerset_tpu.core.config import KConfig
    from kmerset_tpu.core.kmer_set import KmerSet
    from kmerset_tpu.core.kmer_set_compact import KmerSetCompact
    from kmerset_tpu.utils.random import get_random_kmer_set

    cfg = KConfig(k=9, n=6)
    rng = np.random.default_rng(11)
    base = get_random_kmer_set(9, 600, True, rng)
    sets = []
    for i in range(4):
        extra = get_random_kmer_set(9, 150, True, rng)
        merged = np.unique(np.concatenate([base.kmers, extra.kmers]))
        sets.append(
            KmerSetCompact.from_kmer_set(KmerSet(9, merged, _sorted=True), True)
        )

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    host = KmerSetSet(list(sets), True, cfg, seed=3)
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "device")
    dev = KmerSetSet(list(sets), True, cfg, seed=3)
    assert host.children_ == dev.children_
    for i in range(4):
        a = host.get(i, True)
        b = dev.get(i, True)
        np.testing.assert_array_equal(a.kmers, b.kmers)


def test_edge_cases_empty_single_identical():
    """Empty/single/identical-set inputs must round-trip without special
    casing (reference handles these implicitly via its bucket loops)."""
    from kmerset_tpu.core.config import get_config
    from kmerset_tpu.core.kmer_set import KmerSet
    from kmerset_tpu.core.kmer_set_compact import KmerSetCompact

    cfg = get_config(15)
    e = KmerSet(15)
    ce = KmerSetCompact.from_kmer_set(e, True)
    assert ce.size() == 0 and ce.weight() == 0
    assert ce.to_kmer_set(True).size() == 0

    s1 = KmerSet(15, np.array([12345], dtype=np.int64))
    c1 = KmerSetCompact.from_kmer_set(s1, True)
    assert c1.size() == 1 and c1.to_kmer_set(True).equals(s1)

    assert KmerSetSet([], True, cfg).size() == 0
    kss = KmerSetSet([c1], True, cfg)
    assert kss.size() == 1 and kss.get(0, True).equals(s1)
    kss2 = KmerSetSet(
        [c1, KmerSetCompact.from_kmer_set(s1, True)], True, cfg
    )
    assert kss2.get(0, True).equals(s1) and kss2.get(1, True).equals(s1)


def test_multi_set_compression_mesh_exact(monkeypatch):
    """The full multi-set compression loop under mesh force — SPSS
    rebuilds, decode, and the similarity oracle all routed through the
    virtual 8-device mesh — produces the same factorization (identical
    per-set SPSS bytes and children DAG) as the host path."""
    rng = np.random.default_rng(31)
    originals = _related_sets(4, rng)
    compacts = [KmerSetCompact.from_kmer_set(s, True) for s in originals]

    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "mesh")
    kss_m = KmerSetSet(
        [KmerSetCompact(K, c.spss) for c in compacts], True, CFG, seed=11
    )
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "host")
    kss_h = KmerSetSet(
        [KmerSetCompact(K, c.spss) for c in compacts], True, CFG, seed=11
    )
    assert kss_m.size() == kss_h.size()
    assert kss_m.children_ == kss_h.children_
    for cm, ch in zip(kss_m.kmer_sets_compact_, kss_h.kmer_sets_compact_):
        assert cm.spss.to_strings() == ch.spss.to_strings()
    monkeypatch.setenv("KMERSET_TPU_FORCE_BACKEND", "mesh")
    for i, orig in enumerate(originals):
        assert kss_m.get(i, True).equals(orig)


def test_pop_best_pair_equals_scan_at_1000_sets():
    """The lazy-deletion selection heap returns exactly the full-scan
    argmax (max weight, smallest-pair tie-break) through hundreds of
    mutation rounds on a 1000-set pair universe — the sub-quadratic
    selection path for the sharded 1000-set configuration (the reference
    rescans its whole weight map per round,
    lib/core/kmer_set_set.h:308-316)."""
    import heapq

    from kmerset_tpu.core.kmer_set_set import _pop_best_pair

    rng = np.random.default_rng(17)
    n = 1000
    # Sparse random pair universe (the dense one is 500k pairs; 20k is
    # plenty to exercise staleness) with small weights so ties are common.
    pairs = set()
    while len(pairs) < 20000:
        i, j = sorted(rng.integers(0, n, 2).tolist())
        if i != j:
            pairs.add((i, j))
    weights = {p: int(w) for p, w in zip(pairs, rng.integers(0, 50, len(pairs)))}
    heap = [(-w, p) for p, w in weights.items()]
    heapq.heapify(heap)

    def scan_best():
        best = None
        for p, w in weights.items():
            if w > 0 and (best is None or (-w, p) < (-weights[best], best)):
                best = p
        return best

    for _round in range(300):
        expect = scan_best()
        got = _pop_best_pair(heap, weights)
        assert got == expect, f"round={_round}"
        if got is None:
            break
        # Consume the chosen pair and mutate a random batch of weights
        # (stale heap entries accumulate; pushes mirror the greedy loop).
        weights[got] = 0
        batch = rng.choice(len(weights), size=40, replace=False)
        keys = list(weights.keys())
        for bi in batch:
            p = keys[int(bi)]
            w = int(rng.integers(0, 50))
            weights[p] = w
            heapq.heappush(heap, (-w, p))
