"""Device neighbor/degree tables for de Bruijn graph construction.

Hot loop #2 of the reference (8 hash Contains() per k-mer,
reference: lib/core/spss.h:238-273) as one batched sort-join: the 8
extension candidates of every k-mer (4 next + 4 prev) are resolved in a
single `lookup_join` over the sorted set — two bandwidth-bound sorts
instead of 8 binary-search passes (XLA's searchsorted runs ~100x slower
than a sort-join on TPU; see ops/join.py).

Arrays are padded to power-of-two size classes so jit caches stay small.
`tables_traced` is the shared traced construction, also used by the
fused unitig front-end (ops/unitigs.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

SENTINEL = np.int64(1 << 62)  # > any 2k-bit k-mer key (k <= 31: max 2^62 - 1)


def pad_pow2(a: np.ndarray, fill) -> np.ndarray:
    n = a.shape[0]
    size = 1 << max(0, (n - 1).bit_length())
    if size == n:
        return a
    return np.concatenate([a, np.full(size - n, fill, dtype=a.dtype)])


def tables_traced(A, k: int, canonical: bool):
    """Traced side-table construction (call under jit with jnp arrays).

    A: (n,) int64 sorted (sentinel-padded).  Returns
    ((rdeg, rnbr, rsame), (ldeg, lnbr, lsame)) of int32/int32/bool shape
    (n,) arrays; padding rows carry junk the caller trims.
    """
    import jax.numpy as jnp

    from ..core import kmer as kmer_ops
    from .join import lookup_join

    n = A.shape[0]
    cands = []
    ncans = []
    for right in (True, False):
        for c in range(4):
            cand = (
                kmer_ops.next_kmer(A, k, c) if right else kmer_ops.prev_kmer(A, k, c)
            )
            ncans.append(kmer_ops.canonical(cand, k) if canonical else cand)
            cands.append(cand)
    found, idx = lookup_join(A, jnp.concatenate(ncans), n_groups=8)

    out = []
    for side in range(2):
        deg = jnp.zeros(n, dtype=jnp.int32)
        nbr = jnp.zeros(n, dtype=jnp.int32)
        same = jnp.zeros(n, dtype=bool)
        for c in range(4):
            g = side * 4 + c
            ok = found[g] & (ncans[g] != A)
            first = ok & (deg == 0)
            nbr = jnp.where(first, idx[g], nbr)
            if canonical:
                same = jnp.where(first, cands[g] != ncans[g], same)
            deg += ok
        out.append((deg, nbr, same))
    return out[0], out[1]


def _build():
    import jax

    jax.config.update("jax_enable_x64", True)

    return partial(jax.jit, static_argnames=("k", "canonical"))(tables_traced)


_side_tables = None


def device_side_tables(
    A: np.ndarray, k: int, canonical: bool
) -> Optional[Tuple]:
    """Computes both side tables on the accelerator; returns
    ((rdeg, rnbr, rsame), (ldeg, lnbr, lsame)) as numpy arrays trimmed to
    len(A), or None if the device path is unavailable."""
    global _side_tables
    try:
        if _side_tables is None:
            _side_tables = _build()
        Ap = pad_pow2(A, SENTINEL)
        n = A.shape[0]
        (r, l) = _side_tables(Ap, k, canonical)
        out = []
        for deg, nbr, same in (r, l):
            out.append(
                (
                    np.asarray(deg[:n]).astype(np.int64),
                    np.asarray(nbr[:n]).astype(np.int64),
                    np.asarray(same[:n]),
                )
            )
        return out[0], out[1]
    except Exception:  # noqa: BLE001 - fall back to host
        return None
