"""Device (XLA/TPU) k-mer counting pipeline.

The jittable, fixed-shape core of the counter (reference hot loop:
lib/core/kmer_counter.h:80-96 — per-window substring hashing into bucket
maps).  TPU-native formulation, one fused vector program:

    pack windows -> reverse complement -> canonical min -> sort ->
    segment boundaries -> scatter-add counts

All shapes are static: invalid windows (crossing fragment boundaries, or
padding) carry a sentinel key that sorts to the end; `n_unique` marks the
live prefix of the outputs.

Uses int64 keys (2k <= 62 bits).  jax x64 mode is enabled on import of
this module.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

SENTINEL = np.int64((1 << 62) - 1)


def _pack_windows(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Packs every k-window of a code sequence; windows starting in the
    last k-1 positions wrap garbage and must be masked by the caller."""
    n = codes.shape[0]
    out = jnp.zeros(n, dtype=jnp.int64)
    c = codes.astype(jnp.int64)
    for j in range(k):
        shifted = jnp.roll(c, -j) if j else c
        out = (out << 2) | shifted
    return out


def _pack_windows_rc(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Packs the reverse complement of every k-window: base t of rc-window
    at p is 3 - codes[p + k - 1 - t]."""
    n = codes.shape[0]
    out = jnp.zeros(n, dtype=jnp.int64)
    c = (3 - codes).astype(jnp.int64)
    for j in range(k):
        # rc base order: positions p+k-1, p+k-2, ..., p
        shifted = jnp.roll(c, -(k - 1 - j))
        out = (out << 2) | shifted
    return out


def canonical_windows(codes: jnp.ndarray, k: int, canonical: bool) -> jnp.ndarray:
    fwd = _pack_windows(codes, k)
    if not canonical:
        return fwd
    rc = _pack_windows_rc(codes, k)
    return jnp.minimum(fwd, rc)


@partial(jax.jit, static_argnames=("k", "canonical"))
def count_kmers(codes: jnp.ndarray, valid: jnp.ndarray, k: int, canonical: bool):
    """codes: (L,) uint8/int32 base codes; valid: (L,) bool window validity.

    Returns (uniq, counts, n_unique): uniq[:n_unique] are the sorted
    distinct (canonical) k-mers, counts aligned; the tail is sentinel.
    """
    can = canonical_windows(codes, k, canonical)
    key = jnp.where(valid, can, SENTINEL)
    s = jnp.sort(key)
    prev = jnp.concatenate([jnp.full((1,), -1, dtype=s.dtype), s[:-1]])
    live = s != SENTINEL
    boundary = live & (s != prev)
    seg = jnp.cumsum(boundary) - 1
    n = s.shape[0]
    counts = jnp.zeros(n, dtype=jnp.int32).at[
        jnp.where(live, seg, n)
    ].add(1, mode="drop")
    uniq = jnp.full(n, SENTINEL, dtype=jnp.int64).at[
        jnp.where(boundary, seg, n)
    ].set(s, mode="drop")
    n_unique = jnp.sum(boundary)
    return uniq, counts, n_unique


@partial(jax.jit, static_argnames=("k", "canonical", "cutoff"))
def count_to_set(codes, valid, k: int, canonical: bool, cutoff: int):
    """Full counter -> cutoff-filtered set step (reference ToKmerSet,
    lib/core/kmer_counter.h:211-243).  Filtered-out k-mers are re-sorted to
    the sentinel tail so the live prefix is the set."""
    uniq, counts, n_unique = count_kmers(codes, valid, k, canonical)
    keep = (counts >= cutoff) & (uniq != SENTINEL)
    kept = jnp.where(keep, uniq, SENTINEL)
    out = jnp.sort(kept)
    n_kept = jnp.sum(keep)
    n_cut = n_unique - n_kept
    return out, n_kept, n_cut


def window_validity(offsets: np.ndarray, total: int, k: int) -> np.ndarray:
    """Host helper: windows fully inside one fragment are valid
    (split-at-'N' semantics, reference: lib/core/kmer_counter.h:78)."""
    pos = np.arange(total)
    frag_start = np.searchsorted(offsets, pos, side="right")
    end_pos = pos + k - 1
    frag_end = np.searchsorted(offsets, np.minimum(end_pos, total - 1), side="right")
    return (frag_start == frag_end) & (end_pos < total)


def pad_to(x: np.ndarray, size: int, fill=0) -> np.ndarray:
    if x.shape[0] >= size:
        return x[:size]
    pad = np.full(size - x.shape[0], fill, dtype=x.dtype)
    return np.concatenate([x, pad])
