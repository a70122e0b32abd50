"""Pallas TPU kernel: zero-slack stream compaction of sorted key arrays.

The counting pipeline ends by compacting selected run heads (distinct
k-mers passing the cutoff) out of the globally sorted key array
(reference equivalent: the bucketed hash sets materialized by ToKmerSet,
lib/core/kmer_counter.h:211-243).  The XLA formulation re-sorts the full
array with a partition flag fused into the key — a second O(n log^2 n)
sort pass costing as much as the primary sort.

This kernel replaces it with an O(n) pass built around three TPU facts:

  * Pallas grids run SEQUENTIALLY on a core, so later programs may
    overwrite earlier programs' trailing garbage — variable-length
    writes become fixed-size DMAs whose tails are reclaimed by the next
    program.
  * HBM DMA slices of int32 arrays must align to the (8, 128) tile
    (1024 elements).  Each program writes at the 1024-aligned address
    at/below its true destination and reproduces the previous program's
    real tail in the overlap from a VMEM `spill` scratch that persists
    across grid steps.
  * Mosaic supports DYNAMIC rotate amounts (tpu.dynamic_rotate), so a
    flat shift by m is three rotate passes — a lane rotate with a
    carry row plus one sublane rotate (`_flat_shift_left`; round 2's
    per-bit static roll+select network cost ~26 passes).

Pipeline: blockwise partition (one cheap row-sort bringing each row's
kept elements to its prefix — XLA sorts (R, BLOCK) rows ~4x faster than
one flat array; BLOCK defaults to 8192) -> per-row counts + exclusive
scan -> this kernel.
The pair variant carries one payload lane (e.g. run-head positions, from
which run lengths are recovered as position diffs) through the same
shifts.
"""

from __future__ import annotations

import contextlib
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_ALIGN = 1024  # int32 HBM DMA alignment quantum: (8, 128) tile
_FLAG = np.int32(1 << 30)  # partition bit; keys are 2k <= 30 bits


def _block_size() -> int:
    """Elements per row/program.  8K measured best on v5e with the
    dynamic-rotate kernel (full 4M-window step: 2.90 ms at 4K/8K,
    2.95 at 16K, 3.00 at 32K, 3.77 at 64K — the partition row-sort's
    per-element cost grows with row length faster than the per-program
    overhead shrinks).  Env-tunable for other chip generations.

    Must be a power of two >= 2048: good_sort_size only emits 2^p and
    3*2^p sizes, so a non-power-of-two block would NEVER divide any
    sort size and silently disable the kernel the knob exists to tune.
    A malformed value degrades to the default with a warning (raising
    here would be swallowed into a debug-level host fallback by every
    consumer — the whole accelerator backend would vanish over a typo)."""
    import logging
    import os

    default = 8192
    raw = os.environ.get("KMERSET_TPU_COMPACT_BLOCK", "")
    if not raw:
        return default
    try:
        v = int(raw)
        if v < 2048 or v & (v - 1):
            raise ValueError
        return v
    except ValueError:
        logging.getLogger("kmerset").warning(
            "ignoring KMERSET_TPU_COMPACT_BLOCK=%r "
            "(need a power of two >= 2048; using %d)",
            raw,
            default,
        )
        return default


BLOCK = _block_size()


def _flat_shift_left(x2d: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Rotates a (S, 128) int32 buffer left by m positions in row-major
    element order, via Mosaic dynamic rotates (tpu.dynamic_rotate).

    m decomposes as sub_m rows + lane_m lanes.  The lane part needs a
    carry from the next sublane row (one static roll + select); the
    sublane part is one dynamic roll.  Three rotate passes total —
    round 2's log-shift network (one static roll + select per bit of m,
    ~26 passes for the kernel's two shifts) measured at ~0.75 ms of the
    4M-window step; this form cuts the kernel to DMA cost.  Exact for
    any m in [0, S*128).

    All scalar ops are explicitly int32: mixing tracers with Python ints
    hits an infinite weak-type promotion recursion under jax_enable_x64.
    """
    from jax.experimental.pallas import tpu as pltpu

    S = x2d.shape[0]
    lane_m = jax.lax.rem(m, jnp.int32(128))
    sub_m = jax.lax.div(m, jnp.int32(128))
    amt = jax.lax.rem(jnp.int32(128) - lane_m, jnp.int32(128))
    a = pltpu.roll(x2d, amt, axis=1)
    down1 = pltpu.roll(x2d, jnp.int32(S - 1), axis=0)
    b = pltpu.roll(down1, amt, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    part = jnp.where(lane < jnp.int32(128) - lane_m, a, b)
    return pltpu.roll(
        part, jax.lax.rem(jnp.int32(S) - sub_m, jnp.int32(S)), axis=0
    )


def _make_kernel(nbuf: int):
    def kernel(c_ref, dst_ref, rows_ref, out_ref, spill, wsem):
        """Program p writes row p's kept prefix (length c[p]) of each of
        the nbuf lanes to global offset dst[p], 1024-aligned via the
        spill of the previous program."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        p = pl.program_id(0)
        c = c_ref[p]
        d = dst_ref[p]
        align = jnp.int32(_ALIGN)
        a0 = (d // align) * align
        g = d - a0  # previous-program reals to reproduce in [a0, d)

        bufs = []
        for b in range(nbuf):
            bi = np.int32(b)  # Python-int ref indices trace to i64 under x64
            # F = [spill (last 1024 reals emitted) | this row's prefix]
            F = jnp.concatenate([spill[bi], rows_ref[np.int32(0), bi]], axis=0)
            # out[a0 + i] = F[(1024 - g) + i]
            bufs.append(_flat_shift_left(F, align - g))
            # next spill: last 1024 of the real stream = F[c : c + 1024]
            spill[bi] = _flat_shift_left(F, c)[: _ALIGN // 128]

        def write(vb):
            for b in range(nbuf):
                vb[np.int32(b)] = bufs[b]
            cps = [
                pltpu.make_async_copy(
                    vb.at[np.int32(b)],
                    out_ref.at[
                        np.int32(b),
                        pl.ds(a0 // jnp.int32(128), (_ALIGN + BLOCK) // 128),
                        :,
                    ],
                    wsem.at[np.int32(b)],
                )
                for b in range(nbuf)
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()  # writes overlap across programs: retire in order

        pl.run_scoped(
            write, pltpu.VMEM((nbuf, (_ALIGN + BLOCK) // 128, 128), jnp.int32)
        )

    return kernel


def _pallas_compact(rows4, c, dst, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, nbuf = rows4.shape[0], rows4.shape[1]
    n_out = R * BLOCK + 2 * (_ALIGN + BLOCK)
    # Explicit int32 zeros: under jax_enable_x64 the default index-map
    # literals trace to i64, which Mosaic cannot legalize.  (np scalar,
    # not jnp — index maps must not capture tracers.)
    zero = np.int32(0)
    out = pl.pallas_call(
        _make_kernel(nbuf),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(R,),
            in_specs=[
                pl.BlockSpec(
                    (1, nbuf, BLOCK // 128, 128),
                    lambda p, c, d: (p, zero, zero, zero),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (nbuf, n_out // 128, 128),
                lambda p, c, d: (zero, zero, zero),
                memory_space=pl.ANY,
            ),
            scratch_shapes=[
                pltpu.VMEM((nbuf, _ALIGN // 128, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbuf, n_out // 128, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(c, dst, rows4)
    return out.reshape(nbuf, -1)


@partial(jax.jit, static_argnames=("interpret",))
def _compact_call(rows4, c, dst, interpret=False):
    # Tracing a pallas_call nested inside the counting pipeline's jit
    # exceeds CPython's default 1000-frame recursion limit; raise it only
    # for the trace (not as an import side effect).
    sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))
    # Under jax_enable_x64 parts of the pallas lowering trace to i64,
    # which Mosaic cannot legalize; the kernel is pure int32.
    try:
        no_x64 = jax.experimental.disable_x64()
    except Exception:  # noqa: BLE001
        no_x64 = contextlib.nullcontext()
    with no_x64:
        return _pallas_compact(rows4, c, dst, interpret)


def _partition_rows(lanes, keep, num_keys):
    """Blockwise partition: per BLOCK-row, kept elements to the prefix,
    preserving order.  The partition flag is fused into the leading key
    lane; with num_keys covering the full key tuple (kept key tuples are
    strictly increasing run heads), the unstable row sort is
    order-preserving.  Lanes beyond num_keys ride as payload."""
    n = lanes[0].shape[0]
    assert n % BLOCK == 0 and n > 0
    R = n // BLOCK
    fused = jnp.where(keep, lanes[0], lanes[0] | _FLAG)
    ops = [fused.reshape(R, BLOCK)] + [x.reshape(R, BLOCK) for x in lanes[1:]]
    rows = jax.lax.sort(
        tuple(ops), dimension=1, num_keys=num_keys, is_stable=False
    )
    c = jnp.sum(keep.reshape(R, BLOCK), axis=1, dtype=jnp.int32)
    dst = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(c)[:-1].astype(jnp.int32)]
    )
    rows4 = jnp.stack([r.reshape(R, BLOCK // 128, 128) for r in rows], axis=1)
    return rows4, c, dst


def compact_select_multi(lanes, keep, num_keys=1, interpret=False):
    """Compacts the selected positions of each int32 lane to a prefix.

    lanes[0] (with lanes[1:num_keys] as tie-breakers) must be sorted
    ascending with flag-bit headroom (values < 2^30 except sentinels) and
    the kept key tuples strictly increasing — run heads of a sorted array
    are.  n must be a multiple of BLOCK.

    Returns (compacted_lanes, n_sel); entries beyond n_sel are garbage
    (callers sentinel-fill as needed)."""
    rows4, c, dst = _partition_rows(list(lanes), keep, num_keys)
    out = _compact_call(rows4, c, dst, interpret=interpret)
    n_sel = dst[-1] + c[-1]
    n = lanes[0].shape[0]
    return [out[i, :n] for i in range(len(lanes))], n_sel


def compact_select_i32(keys, keep, interpret=False):
    """Single-lane wrapper: compacted[:n_sel] = keys[keep] in order."""
    (out,), n_sel = compact_select_multi([keys], keep, 1, interpret)
    return out, n_sel


def compact_select_pair_i32(keys, vals, keep, interpret=False):
    """Key lane + one payload lane compacted by the same selection."""
    (ck, cv), n_sel = compact_select_multi([keys, vals], keep, 1, interpret)
    return ck, cv, n_sel


def use_compact_kernel(n: int, k: int) -> bool:
    """The kernel path needs a real TPU backend, an int32 key layout
    (single or pair), and a BLOCK-divisible length (good_sort_size emits
    only BLOCK-divisible sizes at or above BLOCK; shorter inputs fall
    back to the flag-fused partition sort)."""
    from .count import PAIR_MAX_K, _use_pallas

    if k > PAIR_MAX_K or n % BLOCK != 0 or n == 0:
        return False
    return _use_pallas()
