"""Device neighbor/degree tables for de Bruijn graph construction.

Hot loop #2 of the reference (8 hash Contains() per k-mer,
reference: lib/core/spss.h:238-273) as a batched binary-search program:
for each k-mer and each base extension, look up the canonical candidate in
the sorted set and accumulate degree / unique-neighbor / same-side tables.

Arrays are padded to power-of-two size classes so jit caches stay small.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

SENTINEL = np.int64((1 << 62) - 1)


def _pad_pow2(a: np.ndarray, fill) -> np.ndarray:
    n = a.shape[0]
    size = 1 << max(0, (n - 1).bit_length())
    if size == n:
        return a
    return np.concatenate([a, np.full(size - n, fill, dtype=a.dtype)])


def _build():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    @partial(jax.jit, static_argnames=("k", "right", "canonical"))
    def side_table(A, k: int, right: bool, canonical: bool):
        """A: (n,) int64 sorted (sentinel-padded).  Returns
        (deg, nbr, same) int32/int32/bool arrays of the same shape."""
        from ..core import kmer as kmer_ops

        n = A.shape[0]
        live = A != SENTINEL
        deg = jnp.zeros(n, dtype=jnp.int32)
        nbr = jnp.zeros(n, dtype=jnp.int32)
        same = jnp.zeros(n, dtype=bool)
        for c in range(4):
            cand = (
                kmer_ops.next_kmer(A, k, c) if right else kmer_ops.prev_kmer(A, k, c)
            )
            if canonical:
                ncan = kmer_ops.canonical(cand, k)
            else:
                ncan = cand
            idx = jnp.searchsorted(A, ncan)
            idx_c = jnp.minimum(idx, n - 1)
            found = (A[idx_c] == ncan) & (ncan != A) & live
            first = found & (deg == 0)
            nbr = jnp.where(first, idx_c.astype(jnp.int32), nbr)
            if canonical:
                same = jnp.where(first, cand != ncan, same)
            deg += found
        return deg, nbr, same

    return side_table


_side_table = None


def device_side_tables(
    A: np.ndarray, k: int, canonical: bool
) -> Optional[Tuple]:
    """Computes both side tables on the accelerator; returns
    ((rdeg, rnbr, rsame), (ldeg, lnbr, lsame)) as numpy arrays trimmed to
    len(A), or None if the device path is unavailable."""
    global _side_table
    try:
        if _side_table is None:
            _side_table = _build()
        Ap = _pad_pow2(A, SENTINEL)
        out = []
        for right in (True, False):
            deg, nbr, same = _side_table(Ap, k, right, canonical)
            n = A.shape[0]
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
