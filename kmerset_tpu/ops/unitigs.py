"""Device unitig front-end: fused side tables -> terminals -> successor.

One jitted program computes, for a sorted canonical k-mer array, the
oriented successor array and chain-start classification of the bidirected
de Bruijn graph (reference semantics: lib/core/spss.h:238-313 neighbor
tables, 276-313 terminal tests, 394-423 orientation flips).  Returning
only `succ` (one int32 per oriented node) plus terminal masks moves
~9 bytes/k-mer off the device instead of the ~26 bytes/k-mer of the raw
side tables; the sequential chain walk + string emission stay on the host
(native/kmerio.c), which needs exactly these arrays.

Orientation convention matches core/spss.py: node u = (entity << 1) | o,
o=0 exits the right side, o=1 exits the left; mirror(u) = u ^ 1.
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

    from .join import lookup_join

    @partial(jax.jit, static_argnames=("k",))
    def unitig_succ(A, k: int):
        """A: (n,) int64 sorted canonical (sentinel-padded).

        Returns (succ (2n,) int32 with -1 at terminal exits,
                 term_l, term_r, both) each (n,) bool."""
        from ..core import kmer as kmer_ops

        n = A.shape[0]
        cands = []
        ncans = []
        for right in (True, False):
            for c in range(4):
                cand = (
                    kmer_ops.next_kmer(A, k, c)
                    if right
                    else kmer_ops.prev_kmer(A, k, c)
                )
                cands.append(cand)
                ncans.append(kmer_ops.canonical(cand, k))
        found, idx = lookup_join(A, jnp.concatenate(ncans), n_groups=8)

        tables = []
        for side in range(2):
            deg = jnp.zeros(n, dtype=jnp.int32)
            nbr = jnp.zeros(n, dtype=jnp.int32)
            same = jnp.zeros(n, dtype=bool)
            for c in range(4):
                g = side * 4 + c
                ok = found[g] & (ncans[g] != A)
                first = ok & (deg == 0)
                nbr = jnp.where(first, idx[g], nbr)
                same = jnp.where(first, cands[g] != ncans[g], same)
                deg += ok
            tables.append((deg, nbr, same))
        (rdeg, rnbr, rsame), (ldeg, lnbr, lsame) = tables

        # Terminal tests (reference: lib/core/spss.h:276-313): a side is
        # terminal unless its unique mate's corresponding side also has a
        # unique back-edge.
        mate_r = jnp.where(rsame, rdeg[rnbr], ldeg[rnbr])
        term_r = (rdeg != 1) | (mate_r != 1)
        mate_l = jnp.where(lsame, ldeg[lnbr], rdeg[lnbr])
        term_l = (ldeg != 1) | (mate_l != 1)

        succ_r = jnp.where(term_r, -1, 2 * rnbr + rsame)
        succ_l = jnp.where(term_l, -1, 2 * lnbr + (~lsame).astype(jnp.int32))
        succ = jnp.stack([succ_r, succ_l], axis=1).reshape(-1)
        both = term_l & term_r
        return succ.astype(jnp.int32), term_l, term_r, both

    return unitig_succ


_unitig_succ = None


def device_unitig_succ(A: np.ndarray, k: int) -> Optional[Tuple]:
    """(succ, term_l, term_r, both) as host arrays trimmed to len(A), or
    None when the device path is unavailable."""
    global _unitig_succ
    try:
        if _unitig_succ is None:
            _unitig_succ = _build()
        n = A.shape[0]
        Ap = _pad_pow2(A, SENTINEL)
        succ, term_l, term_r, both = _unitig_succ(Ap, k)
        return (
            np.asarray(succ[: 2 * n]).astype(np.int64),
            np.asarray(term_l[:n]),
            np.asarray(term_r[:n]),
            np.asarray(both[:n]),
        )
    except Exception:  # noqa: BLE001 - fall back to host
        return None
