"""Pallas TPU kernel: fused window pack + canonicalization.

The counting front-end turns a base-code stream into one canonical
k-mer key per window (reference inner loop: lib/core/kmer_counter.h:80-96
builds each window with per-base shifts).  The XLA formulation in
ops/count.py uses ~2*log2(k) `jnp.roll` passes, each a full HBM
read+write; this kernel streams every code tile through VMEM exactly
once (with a k-1 halo) and does all 2k shift/or steps plus the
reverse-complement min on-chip.

Two key layouts are implemented, covering all three CLI k values
(reference: src/kmerset-build.cc:130-143):

  * k <= 15: one canonical int32 key per window;
  * k <= 23: an (hi, lo) int32 pair — hi packs the first ceil(k/2)
    bases, lo the rest, with the canonical strand chosen by
    lexicographic (hi, lo) compare, matching ops.count._pair_windows.

Wider k falls back to the XLA roll path automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 1 << 17  # windows per grid step; scratch = (BLOCK + halo) int32 in VMEM
_HALO = 1024  # >= k - 1; 1D HBM DMA slices must align to the (1024) tiling


def _kernel(k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(codes_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * BLOCK, BLOCK + _HALO)], scratch, sem
        )
        dma.start()
        dma.wait()

        # Log-doubling pack on values (static slices only — Mosaic has no
        # dynamic_slice): packs[l][p] = window of 2^l bases at p, fwd
        # ascending / rc descending over the complemented codes.
        c = scratch[:]
        d = 3 - c

        def build(base, mirrored):
            packs = [base]
            span = 1
            while span * 2 <= k:
                prev = packs[-1]
                m = prev.shape[0] - span
                if mirrored:
                    packs.append((prev[span : span + m] << (2 * span)) | prev[:m])
                else:
                    packs.append((prev[:m] << (2 * span)) | prev[span : span + m])
                span *= 2
            return packs

        def combine(packs, mirrored):
            out = None
            pos = 0
            for l in range(len(packs) - 1, -1, -1):
                size = 1 << l
                if not (k & size):
                    continue
                off = (k - pos - size) if mirrored else pos
                piece = packs[l][off : off + BLOCK]
                out = piece if out is None else ((out << (2 * size)) | piece)
                pos += size
            return out

        fwd = combine(build(c, False), False)
        rc = combine(build(d, True), True)
        out_ref[:] = jnp.minimum(fwd, rc)

    return kernel


def _pair_kernel(k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kh = (k + 1) // 2  # hi-lane bases
    kl = k - kh

    def kernel(codes_hbm, hi_ref, lo_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * BLOCK, BLOCK + _HALO)], scratch, sem
        )
        dma.start()
        dma.wait()

        c = scratch[:]
        d = 3 - c

        def build(base, mirrored, m):
            packs = [base]
            span = 1
            while span * 2 <= m:
                prev = packs[-1]
                n = prev.shape[0] - span
                if mirrored:
                    packs.append((prev[span : span + n] << (2 * span)) | prev[:n])
                else:
                    packs.append((prev[:n] << (2 * span)) | prev[span : span + n])
                span *= 2
            return packs

        fpacks = build(c, False, kh)
        mpacks = build(d, True, kh)

        def combine_fwd(off, m):
            """Window of m bases starting at p + off, MSB first."""
            out = None
            pos = 0
            for l in range(len(fpacks) - 1, -1, -1):
                size = 1 << l
                if not (m & size):
                    continue
                piece = fpacks[l][off + pos : off + pos + BLOCK]
                out = piece if out is None else ((out << (2 * size)) | piece)
                pos += size
            return out

        def combine_rc(off, m):
            """RC lane: 3-complemented bases at descending positions
            p + off + m - 1 .. p + off, MSB first."""
            out = None
            pos = 0
            for l in range(len(mpacks) - 1, -1, -1):
                size = 1 << l
                if not (m & size):
                    continue
                po = off + (m - pos - size)
                piece = mpacks[l][po : po + BLOCK]
                out = piece if out is None else ((out << (2 * size)) | piece)
                pos += size
            return out

        hi = combine_fwd(0, kh)
        lo = combine_fwd(kh, kl)
        # rc hi lane: bases t in [0, kh) are 3 - codes[p + k - 1 - t],
        # i.e. descending positions [k - kh, k) = offset kl, length kh;
        # rc lo lane: descending positions [0, kl).
        rhi = combine_rc(kl, kh)
        rlo = combine_rc(0, kl)
        less = (rhi < hi) | ((rhi == hi) & (rlo < lo))
        hi_ref[:] = jnp.where(less, rhi, hi)
        lo_ref[:] = jnp.where(less, rlo, lo)

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret"))
def _call(codes_padded: jnp.ndarray, k: int, interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = (codes_padded.shape[0] - _HALO) // BLOCK
    return pl.pallas_call(
        _kernel(k),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BLOCK,), jnp.int32),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK + _HALO,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(codes_padded)


@partial(jax.jit, static_argnames=("k", "interpret"))
def _pair_call(codes_padded: jnp.ndarray, k: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_blocks = (codes_padded.shape[0] - _HALO) // BLOCK
    out_sds = jax.ShapeDtypeStruct((n_blocks * BLOCK,), jnp.int32)
    return pl.pallas_call(
        _pair_kernel(k),
        out_shape=(out_sds, out_sds),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK + _HALO,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(codes_padded)


def canonical_windows_pallas(
    codes: jnp.ndarray, k: int, interpret: bool = False
) -> jnp.ndarray:
    """Canonical int32 window keys for every position of `codes`
    (positions beyond len - k + 1 hold garbage; callers mask by validity).

    codes: (L,) int32.  Returns (L,) int32 (trimmed to input length).
    """
    assert k <= 15, "pallas pack kernel supports the single-int32-key case"
    L = codes.shape[0]
    n_blocks = -(-L // BLOCK)
    padded_len = n_blocks * BLOCK + _HALO
    codes_p = jnp.zeros(padded_len, jnp.int32).at[:L].set(codes)
    out = _call(codes_p, k, interpret)
    return out[:L]


def canonical_windows_pair_pallas(codes: jnp.ndarray, k: int, interpret: bool = False):
    """Canonical (hi, lo) int32 window key lanes for every position of
    `codes` (k <= 23 pair layout; tail positions hold garbage, callers
    mask by validity)."""
    assert 15 < k <= 23, "pair pack kernel covers the (hi, lo) layout"
    L = codes.shape[0]
    n_blocks = -(-L // BLOCK)
    padded_len = n_blocks * BLOCK + _HALO
    codes_p = jnp.zeros(padded_len, jnp.int32).at[:L].set(codes)
    hi, lo = _pair_call(codes_p, k, interpret)
    return hi[:L], lo[:L]
