"""KmerSetSet: joint compression of many related k-mer sets.

Mirrors the reference KmerSetSet (reference: lib/core/kmer_set_set.h:89-625)
and KmerSetSetReader (kmer_set_set.h:627-775): repeatedly factor out the
intersection of the most similar pair of sets into a new shared child set,
recording the parent->child DAG, so each original set is reconstructed as
the union of its residual and all reachable descendants.

Differences by design:
- pair similarity uses sampled-bucket sketches exactly like the reference
  (2% of buckets), but the bucket sample is drawn from a seeded generator —
  the reference's unseeded sampling (reference: lib/core/random.h:17)
  makes its output nondeterministic run-to-run;
- set algebra and sketch intersections are sorted-array merges instead of
  hash buckets.

The directory format is byte-compatible: meta.<ext> holds the serialized
adjacency list and the set count; <i>.<ext> holds each compact set
(reference: kmer_set_set.h:459-530).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from . import io as core_io
from .config import KConfig
from .kmer_set import KmerSet, intersection_size
from .kmer_set_compact import KmerSetCompact

AdjacencyList = Dict[int, List[int]]


def serialize_adjacency_list(adj: AdjacencyList) -> str:
    """Exact reference format: "size key count children ..."
    (reference: kmer_set_set.h:45-56).  Keys emitted in sorted order (the
    reference emits hash order; its reader accepts any order)."""
    parts = [str(len(adj))]
    for key in sorted(adj):
        parts.append(str(key))
        parts.append(str(len(adj[key])))
        parts.extend(str(v) for v in adj[key])
    return " ".join(parts)


def deserialize_adjacency_list(s: str) -> AdjacencyList:
    """Inverse (reference: kmer_set_set.h:58-85)."""
    tokens = s.split()
    it = iter(tokens)
    size = int(next(it))
    adj: AdjacencyList = {}
    for _ in range(size):
        key = int(next(it))
        count = int(next(it))
        adj[key] = [int(next(it)) for _ in range(count)]
    return adj


class KmerSetSet:
    def __init__(
        self,
        kmer_sets_compact: List[KmerSetCompact],
        canonical: bool,
        config: KConfig,
        seed: int = 0,
        _children: AdjacencyList | None = None,
    ):
        self.config = config
        self.canonical = canonical
        if _children is not None:
            self.children_: AdjacencyList = _children
            self.kmer_sets_compact_ = kmer_sets_compact
            return
        self.children_ = {}
        self.kmer_sets_compact_ = list(kmer_sets_compact)
        self._compress(canonical, seed)

    # -- the greedy factor loop (reference: kmer_set_set.h:109-427) --------

    def _compress(self, canonical: bool, seed: int) -> None:
        cfg = self.config
        sets = self.kmer_sets_compact_
        n_inputs = len(sets)
        if n_inputs == 0:
            return

        # ~2% of buckets sampled (reference: kmer_set_set.h:120-128).
        n_sample = max(1, cfg.n_buckets // 50)
        rng = np.random.default_rng(seed)
        bucket_ids = np.sort(
            rng.choice(cfg.n_buckets, size=n_sample, replace=False)
        ).astype(np.int64)

        sampled: List[np.ndarray] = [
            s.sampled_kmers(cfg, bucket_ids, canonical) for s in sets
        ]

        def edge_weight(i: int, j: int) -> int:
            return intersection_size(sampled[i], sampled[j])

        weights: Dict[Tuple[int, int], int] = {}
        for i in range(n_inputs):
            for j in range(i + 1, n_inputs):
                weights[(i, j)] = edge_weight(i, j)

        # Stopping rule (reference: kmer_set_set.h:240-302).
        def total_spss_weight() -> int:
            return sum(s.weight() for s in sets)

        total_weight = total_spss_weight()
        interval = n_inputs // 8 + 1
        improvement_threshold = 0.1 * interval / n_inputs

        it = 0
        while True:
            if it > 0 and it % interval == 0:
                updated = total_spss_weight()
                improvement = (total_weight - updated) / total_weight
                if improvement <= improvement_threshold:
                    break
                total_weight = updated
            it += 1

            # Max-weight pair; deterministic smallest-pair tie-break.
            best_w = 0
            best_pair: Tuple[int, int] | None = None
            for pair in sorted(weights):
                w = weights[pair]
                if w > best_w:
                    best_w = w
                    best_pair = pair
            if best_pair is None:
                break
            j, k = best_pair

            n = len(sets)
            kj = sets[j].kmers(canonical)
            kk = sets[k].kmers(canonical)
            inter = np.intersect1d(kj, kk, assume_unique=True)
            kj2 = np.setdiff1d(kj, inter, assume_unique=True)
            kk2 = np.setdiff1d(kk, inter, assume_unique=True)

            sets.append(
                KmerSetCompact.from_kmer_set(
                    KmerSet(cfg.k, inter, _sorted=True), canonical
                )
            )
            sets[j] = KmerSetCompact.from_kmer_set(
                KmerSet(cfg.k, kj2, _sorted=True), canonical
            )
            sets[k] = KmerSetCompact.from_kmer_set(
                KmerSet(cfg.k, kk2, _sorted=True), canonical
            )
            sampled.append(sets[n].sampled_kmers(cfg, bucket_ids, canonical))
            sampled[j] = sets[j].sampled_kmers(cfg, bucket_ids, canonical)
            sampled[k] = sets[k].sampled_kmers(cfg, bucket_ids, canonical)
            self.children_.setdefault(j, []).append(n)
            self.children_.setdefault(k, []).append(n)

            # Update weights of pairs touching j, k, n
            # (reference: kmer_set_set.h:382-425).
            for l in range(n):
                if l != j:
                    weights[(min(j, l), max(j, l))] = edge_weight(j, l)
                if l != k:
                    weights[(min(k, l), max(k, l))] = edge_weight(k, l)
                weights[(l, n)] = edge_weight(l, n)

    # -- queries (reference: kmer_set_set.h:429-454) -----------------------

    def size(self) -> int:
        return len(self.kmer_sets_compact_)

    def _reachable(self, i: int) -> List[int]:
        ids: List[int] = []
        seen = set()
        queue = [i]
        while queue:
            cur = queue.pop(0)
            if cur in seen:
                continue
            seen.add(cur)
            ids.append(cur)
            queue.extend(self.children_.get(cur, []))
        return ids

    def get(self, i: int, canonical: bool) -> KmerSet:
        """Original set = residual union all reachable shared children."""
        parts = [
            self.kmer_sets_compact_[j].kmers(canonical) for j in self._reachable(i)
        ]
        return KmerSet(self.config.k, np.unique(np.concatenate(parts)), _sorted=True)

    # -- persistence (reference: kmer_set_set.h:456-615) -------------------

    def dump(self, directory: str, compressor: str, extension: str) -> None:
        os.makedirs(directory, exist_ok=True)
        meta = [
            serialize_adjacency_list(self.children_),
            str(len(self.kmer_sets_compact_)),
        ]
        core_io.write_lines(
            os.path.join(directory, f"meta.{extension}"), compressor, meta
        )
        for i, s in enumerate(self.kmer_sets_compact_):
            s.dump(os.path.join(directory, f"{i}.{extension}"), compressor)

    def dump_graph(self, file_name: str) -> None:
        """DOT format (reference: kmer_set_set.h:532-547)."""
        lines = ["digraph G {"]
        for key in sorted(self.children_):
            for child in self.children_[key]:
                lines.append(f"v{key} -> v{child}")
        lines.append("}")
        core_io.write_lines(file_name, "", lines)

    @classmethod
    def load(
        cls,
        config: KConfig,
        directory: str,
        decompressor: str,
        extension: str,
        canonical: bool,
    ) -> "KmerSetSet":
        meta = core_io.read_lines(
            os.path.join(directory, f"meta.{extension}"), decompressor
        )
        children = deserialize_adjacency_list(meta[0])
        n = int(meta[1])
        sets = [
            KmerSetCompact.load(
                config.k, os.path.join(directory, f"{i}.{extension}"), decompressor
            )
            for i in range(n)
        ]
        return cls(sets, canonical, config, _children=children)


class KmerSetSetReader:
    """Reads meta only; loads just the files reachable from the requested
    set (reference: kmer_set_set.h:627-775)."""

    def __init__(
        self,
        config: KConfig,
        directory: str,
        extension: str,
        decompressor: str,
        canonical: bool,
        children: AdjacencyList,
        size: int,
    ):
        self.config = config
        self.directory = directory
        self.extension = extension
        self.decompressor = decompressor
        self.canonical = canonical
        self.children_ = children
        self._size = size

    @classmethod
    def from_directory(
        cls,
        config: KConfig,
        directory: str,
        extension: str,
        decompressor: str,
        canonical: bool,
    ) -> "KmerSetSetReader":
        meta = core_io.read_lines(
            os.path.join(directory, f"meta.{extension}"), decompressor
        )
        children = deserialize_adjacency_list(meta[0])
        size = int(meta[1])
        return cls(config, directory, extension, decompressor, canonical, children, size)

    def size(self) -> int:
        return self._size

    def get(self, i: int) -> KmerSet:
        ids: List[int] = []
        seen = set()
        queue = [i]
        while queue:
            cur = queue.pop(0)
            if cur in seen:
                continue
            seen.add(cur)
            ids.append(cur)
            queue.extend(self.children_.get(cur, []))
        parts = []
        for idx in ids:
            s = KmerSetCompact.load(
                self.config.k,
                os.path.join(self.directory, f"{idx}.{self.extension}"),
                self.decompressor,
            )
            parts.append(s.kmers(self.canonical))
        return KmerSet(
            self.config.k, np.unique(np.concatenate(parts)), _sorted=True
        )
