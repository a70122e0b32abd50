"""Device-resident sketch table for multi-set similarity.

The KmerSetSet compressor estimates pairwise set similarity as the
intersection size of sampled-bucket sketches (reference:
lib/core/kmer_set_set.h:158-219 computes all n(n-1)/2 pairs with a
thread-pool of sorted-vector merges).  Here the sketches live on the
accelerator as one padded (rows, S) int64 matrix and any batch of pair
weights is answered with a single row-wise unstable sort: |A ∩ B| equals
the number of adjacent equal elements in sorted(concat(A, B)) when A and
B are duplicate-free.

Row updates (the greedy loop rewrites 2 rows and appends 1 per
iteration, reference: kmer_set_set.h:332-380) are in-place device
`.at[row].set`; capacities grow in powers of two to bound recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import numpy as np

from .count import SENTINEL  # canonical definition (one source of truth)

# Cap on elements per device sort call; larger pair batches are chunked.
_MAX_ELEMENTS = 1 << 26


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _build():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    @jax.jit
    def pair_weights(sk, ia, ib):
        a = sk[ia]
        b = sk[ib]
        merged = jnp.concatenate([a, b], axis=1)
        s = jax.lax.sort(merged, dimension=1, is_stable=False)
        hit = (s[:, 1:] == s[:, :-1]) & (s[:, 1:] != SENTINEL)
        return jnp.sum(hit, axis=1, dtype=jnp.int64)

    @jax.jit
    def set_row(sk, i, row):
        return sk.at[i].set(row)

    return pair_weights, set_row


_fns = None


class DeviceSketchTable:
    """Padded device matrix of per-set sketches with batched pair weights.

    Falls back never — construction raises if jax is unavailable; callers
    gate on `kmerset_tpu.ops.backend.should_use_device`.
    """

    def __init__(self, sketches: Sequence[np.ndarray]):
        global _fns
        if _fns is None:
            _fns = _build()
        import jax

        self._jax = jax
        self.S = _pow2(max(1, max((s.shape[0] for s in sketches), default=1)))
        self.rows_cap = _pow2(max(1, len(sketches)))
        self.n = len(sketches)
        # Fill host-side and upload ONCE: per-row jitted set_row calls
        # would each materialize a fresh full (rows_cap, S) device buffer
        # (quadratic HBM traffic in the number of sketches).
        mat = np.full((self.rows_cap, self.S), SENTINEL, dtype=np.int64)
        for i, s in enumerate(sketches):
            mat[i] = self._pad_row(s)
        self._sk = jax.device_put(mat)

    def _pad_row(self, sketch: np.ndarray) -> np.ndarray:
        if sketch.shape[0] > self.S:
            raise ValueError(
                f"sketch of size {sketch.shape[0]} exceeds capacity {self.S}"
            )
        row = np.full(self.S, SENTINEL, dtype=np.int64)
        row[: sketch.shape[0]] = sketch
        return row

    def set_row(self, i: int, sketch: np.ndarray) -> None:
        _, set_row = _fns
        self._sk = set_row(self._sk, i, self._pad_row(sketch))

    def append_row(self, sketch: np.ndarray) -> int:
        import jax.numpy as jnp

        if self.n == self.rows_cap:
            self.rows_cap *= 2
            pad = jnp.full(
                (self.rows_cap - self.n, self.S), SENTINEL, dtype=jnp.int64
            )
            self._sk = jnp.concatenate([self._sk, pad], axis=0)
        i = self.n
        self.n += 1
        self.set_row(i, sketch)
        return i

    def pair_weights(self, pairs: List[tuple]) -> np.ndarray:
        """Intersection sizes for a list of (i, j) row pairs."""
        pair_weights, _ = _fns
        if not pairs:
            return np.empty(0, dtype=np.int64)
        ia = np.array([p[0] for p in pairs], dtype=np.int32)
        ib = np.array([p[1] for p in pairs], dtype=np.int32)
        batch = max(1, _MAX_ELEMENTS // (2 * self.S))
        out = np.empty(len(pairs), dtype=np.int64)
        for s in range(0, len(pairs), batch):
            e = min(s + batch, len(pairs))
            n_pad = _pow2(e - s)
            ia_p = np.zeros(n_pad, np.int32)
            ib_p = np.zeros(n_pad, np.int32)
            ia_p[: e - s] = ia[s:e]
            ib_p[: e - s] = ib[s:e]
            w = np.asarray(pair_weights(self._sk, ia_p, ib_p))
            out[s:e] = w[: e - s]
        return out


class MeshSketchTable:
    """Sketch table sharded over a device mesh by k-mer key range.

    Each device holds its key range of every sketch (the same key-range
    decomposition as every other sharded structure in parallel/mesh.py);
    pair weights are computed range-locally and psum'd — sketches never
    move between devices (the distributed form of the reference's
    similarity phase, lib/core/kmer_set_set.h:158-219).
    """

    def __init__(self, sketches: Sequence[np.ndarray], k: int, mesh=None):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import (
            _owner_edges,
            make_mesh,
            sharded_sketch_weights_fn,
        )

        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_dev = self.mesh.devices.size
        self.k = k
        # The exact key-range decomposition every other sharded structure
        # uses (parallel/mesh.py) — a k-mer's owning device must agree
        # across the whole system.
        self.edges = _owner_edges(k, self.n_dev)
        per = max(1, max((s.shape[0] for s in sketches), default=1))
        self.per_dev = _pow2(per)  # capacity per device per row
        self.S = self.per_dev * self.n_dev
        self.n = len(sketches)
        rows_cap = _pow2(max(1, self.n))
        mat = np.full((rows_cap, self.S), SENTINEL, dtype=np.int64)
        for i, s in enumerate(sketches):
            mat[i] = self._shard_row(s)
        sharding = NamedSharding(self.mesh, P(None, "kv"))
        self._sk = jax.device_put(mat, sharding)
        self._fn = sharded_sketch_weights_fn(self.mesh)
        self._sharding = sharding
        self._set_row_fn = jax.jit(
            lambda sk, i, row: sk.at[i].set(row),
            out_shardings=sharding,
        )

    def _shard_row(self, sketch: np.ndarray) -> np.ndarray:
        row = np.full(self.S, SENTINEL, dtype=np.int64)
        for d in range(self.n_dev):
            part = sketch[
                (sketch >= self.edges[d]) & (sketch < self.edges[d + 1])
            ]
            if part.shape[0] > self.per_dev:
                raise ValueError("sketch range exceeds per-device capacity")
            row[d * self.per_dev : d * self.per_dev + part.shape[0]] = part
        return row

    def set_row(self, i: int, sketch: np.ndarray) -> None:
        import jax

        if i >= self._sk.shape[0]:
            # Rare growth path: double the row capacity host-side.
            mat = np.array(jax.device_get(self._sk))
            grow = np.full((mat.shape[0], self.S), SENTINEL, dtype=np.int64)
            mat = np.concatenate([mat, grow], axis=0)
            self._sk = jax.device_put(mat, self._sharding)
        # In-place device row update (no full-matrix host round trip).
        self._sk = self._set_row_fn(self._sk, i, self._shard_row(sketch))
        self.n = max(self.n, i + 1)

    def append_row(self, sketch: np.ndarray) -> int:
        i = self.n
        self.set_row(i, sketch)
        return i

    def pair_weights(self, pairs: List[tuple]) -> np.ndarray:
        if not pairs:
            return np.empty(0, dtype=np.int64)
        ia_all = np.array([p[0] for p in pairs], dtype=np.int32)
        ib_all = np.array([p[1] for p in pairs], dtype=np.int32)
        # Chunk like DeviceSketchTable: the initial all-pairs batch is
        # n(n-1)/2 pairs (~500K at 1000 sets), and each pair sorts a
        # (2*per_dev,) row per device — unbatched that is a
        # (n_pairs, 2*per_dev) sort buffer far past HBM.  Pad chunks to
        # powers of two so jit caches stay small.
        batch = max(1, _MAX_ELEMENTS // (2 * self.per_dev))
        out = np.empty(len(pairs), dtype=np.int64)
        for s in range(0, len(pairs), batch):
            e = min(s + batch, len(pairs))
            n_pad = _pow2(e - s)
            ia = np.zeros(n_pad, dtype=np.int32)
            ib = np.zeros(n_pad, dtype=np.int32)
            ia[: e - s] = ia_all[s:e]
            ib[: e - s] = ib_all[s:e]
            out[s:e] = np.asarray(self._fn(self._sk, ia, ib))[: e - s]
        return out
